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


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column],
               n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase aggregation for algebraic aggregates: partial on (keys, salt),
    final merge on keys.  ``aggs`` maps output name → partial-phase aggregate; the
    merge phase re-aggregates: sum→sum, count→sum, min→min, max→max (pass the merge
    form explicitly via tuples when they differ)."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(f"_p_{name}") for name, a in aggs.items()])
    merged = partial.groupBy(*keys).agg(*[
        _merge_expr(name, a).alias(name) for name, a in aggs.items()])
    return merged


def _merge_expr(name: str, partial: Column) -> Column:
    """Merge phase for the common algebraic aggregates (sum/count→sum, min, max)."""
    expr = partial._jc.toString().lower()
    col = F.col(f"_p_{name}")
    if expr.startswith("min("):
        return F.min(col)
    if expr.startswith("max("):
        return F.max(col)
    # sum / count / countDistinct-free totals all merge by summing partials
    return F.sum(col)


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
