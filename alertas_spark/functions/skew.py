"""Skew mitigation: salted two-phase aggregation and salted broadcast-free joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default in
session.py) handles most runtime skew; these helpers are the *declarative* escape
hatch for the pathological cases a 100 TB pipeline hits — a handful of keys holding
1000× the median rows (the reference's `documento`→`vista` fan has exactly this shape
for bulk-imported documents).

* ``salted_agg`` — map-side salt → partial agg on (key, salt) → final agg on key.
  Spark already does partial aggregation per partition, which de-skews *commutative*
  aggregates by itself; explicit salting matters when the grouping is followed by a
  per-key expensive step (collect_list, exact distinct) where one reducer would
  otherwise own the hot key.
* ``salted_join`` — replicate the small side per salt, salt the big side's key:
  hot-key rows spread over N reducers.  Only for when the small side is too big to
  broadcast but the join key is skewed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS,
              col_name: str = "_salt") -> DataFrame:
    """Uniform int salt derived from a stable row hash (no RNG → deterministic,
    resumable tasks)."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(col_name, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


#: An aggregate spec: either a partial-phase Column (merged by summing the partials
#: — correct for sum/count), or an explicit ``(partial, merge)`` pair where ``merge``
#: maps the partial's output column to the final aggregate (e.g. ``(F.min(c), F.min)``).
AggSpec = "Column | tuple[Column, Callable[[Column], Column]]"


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, object],
               n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase aggregation for algebraic aggregates: partial on (keys, salt),
    final merge on keys.  ``aggs`` maps output name → :data:`AggSpec`; a bare
    Column merges by summing partials (sum/count), everything else — min, max,
    bit_or, … — must pass its merge explicitly as a ``(partial, merge)`` tuple.
    Explicit pairs beat inferring the merge from the expression string: the
    decomposition partial+merge is part of the aggregate's algebra, not something
    to reverse-engineer from a plan printout."""
    partials: dict[str, Column] = {}
    merges: dict[str, Column] = {}
    for name, spec in aggs.items():
        partial, merge = spec if isinstance(spec, tuple) else (spec, F.sum)
        partials[name] = partial.alias(f"_p_{name}")
        merges[name] = merge(F.col(f"_p_{name}")).alias(name)
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partials.values())
    return partial.groupBy(*keys).agg(*merges.values())


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = DEFAULT_SALTS, how: str = "inner") -> DataFrame:
    """Skewed equi join without broadcast: big side gets a derived salt, small side
    is replicated once per salt value (explode of a literal range), and the join key
    becomes (key, salt) — hot keys fan out over ``n_salts`` reducers."""
    # salt from the FULL row (not the key — that hash is constant per key and would
    # land every hot-key row on one reducer again)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return big_s.join(small_r, [key, "_salt"], how).drop("_salt")
