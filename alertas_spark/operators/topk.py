"""Distributed two-phase top-k: per-partition shortlist → exact final rank.

A global ``Window.partitionBy(query_id)`` rank parallelizes only across distinct
query ids: with 10 queries the rank stage has 10 partitions and each one sorts
its FULL candidate set in a single task — the classic scale-killer hiding in an
otherwise-clean ANN plan (this repo's round-5 verdict, `pq.py` / `simsearch.py`).

The fix is the standard two-phase shape every distributed top-k uses
(SELECT-ORDER-LIMIT in Spark itself runs as ``TakeOrderedAndProject`` with
per-partition partial top-k):

1. **local phase** — every input partition reduces to at most ``k`` rows per
   key with NO shuffle (``mapInPandas`` pass-through: rows are selected, never
   recomputed, so float values stay bit-identical to the upstream plan);
2. **global phase** — the surviving ``≤ k · n_partitions · n_keys`` rows (tiny)
   get the exact rank with the original window.

Correctness: the global top-k under a total order is contained in the union of
per-partition top-k under the same order, so phase 2 over phase 1's output is
exactly equal to the full rank — for ANY partitioning of the input.  The order
must be total (tie column unique per key) for determinism; every caller ranks
by a float with the candidate id as tiebreak.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def local_topk(df: DataFrame, keys: Sequence[str], by: str, tie: str, k: int,
               ascending: bool) -> DataFrame:
    """Phase 1: reduce ``df`` to ≤ ``k`` rows per ``keys`` group per partition,
    ordered by ``(by, tie)`` (``tie`` always ascending).  Selection only — every
    surviving row is byte-identical to its input row."""
    import pandas as pd

    keys = list(keys)
    schema = df.schema

    def gen(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat((best, pdf),
                                                     ignore_index=True)
            cur = cur.sort_values([by, tie], ascending=[ascending, True],
                                  kind="mergesort", ignore_index=True)
            # running shortlist: memory stays O(k · keys) + one batch
            best = cur.groupby(keys, sort=False).head(k)
        if best is not None and len(best):
            yield best

    return df.mapInPandas(gen, schema)


def ranked_topk(scored: DataFrame, key: str, by: str, tie: str, k: int,
                ascending: bool, rank_col: str = "rnk") -> DataFrame:
    """Two-phase exact top-k: rows of ``scored`` holding the ``k`` best per
    ``key`` by ``(by, tie)``, with their exact global rank in ``rank_col``.
    Plan shape: zero-shuffle local shortlist, then one window over the reduced
    set — never a full-corpus sort in ``n_keys`` tasks."""
    order: list[Column] = [
        F.asc(by) if ascending else F.desc(by), F.asc(tie)]
    shortlist = local_topk(scored, [key], by, tie, k, ascending)
    w = Window.partitionBy(key).orderBy(*order)
    return (shortlist.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))
