"""SemDeDup-style semantic deduplication: cluster, then dedup within clusters.

Pairwise-cosine dedup over a whole corpus is O(n²); the published corpus-scale
shape (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023) first partitions the embedding space with
k-means, then scores pairs ONLY within each cluster and keeps one
representative per duplicate group.  This module composes three operators the
engine already proves oracle-equal:

* the deterministic Lloyd trainer (operators/kmeans.py — seeded init,
  sequential-fold distances, decimal-exact means), served through the
  persistent artifact store so training happens once per corpus snapshot;
* the grouped-Arrow-batch pairwise verifier (one BLAS matmul per cluster —
  the ``dedup_embedding_cosine_blocked`` pattern with the TRAINED partition
  instead of the train-free hyperplane blocks);
* large-star/small-star connected components for the keep/drop labels
  (operators/dedup.py), because near-dup relations are not transitive and a
  per-pair drop decision double-drops chains.

Scale shape: the only all-pairs work is within a cluster (Σ cluster² — K
grows with the corpus, SemDeDup uses n/1000-ish cells, and the
``BLOCK_MAX_ROWS`` guard fails fast if the quantizer is too coarse rather
than silently quadratic); assignment is one broadcast join + argmin per
Lloyd round; the CC contraction is O(log diameter) rounds.  The missed-recall
trade is inherent and documented in the paper: a pair split across two
k-means cells is never scored — the hyperplane-blocked and MinHash tiers are
the recall-oriented siblings.

Threshold: :data:`SEM_TAU` reuses the corpus-wide ``COS_THRESHOLD`` so the
semantic tier's pair graph is the same contract as the exact/blocked tiers
(differing only in candidate blocking, which makes the tiers' recall
directly comparable); production SemDeDup runs at 0.95+ — one knob.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alertas_spark.operators.dedup import (BLOCK_MAX_ROWS, COS_THRESHOLD,
                                           connected_components)
from alertas_spark.operators.embgate import EMB_VALID_SQL
from alertas_spark.operators.kmeans import (K, _duck_assign, _duck_update,
                                            trained_assignment)
from alertas_spark.operators.simsearch import _DUCK_DOT, _DUCK_NORM2
from alertas_spark.registry import declare

SEM_TAU = COS_THRESHOLD

_PAIR_DUCK = (f"{_DUCK_DOT.format(a='a.emb', b='b.emb')}"
              f" / (a.nrm * b.nrm) >= {SEM_TAU}")


def semantic_edges(assigned: DataFrame, tau: float = SEM_TAU) -> DataFrame:
    """Within-cluster near-dup pairs over a ``(vec_id, emb, cid, nrm)``
    assignment: one grouped Arrow batch per cluster, rows normalized by the
    precomputed norm, one BLAS matmul, threshold the upper triangle — the
    pair relation is never materialized before thresholding.  Raises if a
    cluster exceeds ``BLOCK_MAX_ROWS`` (the quantizer is too coarse for the
    duplicate structure: retrain with a larger K, never fall back to a
    silent O(n²))."""

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > BLOCK_MAX_ROWS:
            raise ValueError(
                f"semantic-dedup cluster holds {len(pdf)} rows "
                f"(> {BLOCK_MAX_ROWS}); retrain the quantizer with a larger "
                f"K for finer cells")
        if len(pdf) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
        m_n = m / pdf["nrm"].to_numpy(dtype=np.float64)[:, None]
        sims = m_n @ m_n.T
        ri, ci = np.where(sims >= tau)
        keep = ids[ri] < ids[ci]
        return pd.DataFrame({"src": ids[ri[keep]], "dst": ids[ci[keep]]})

    return assigned.groupBy("cid").applyInPandas(
        cluster_pairs, "src long, dst long")


@declare(
    "dedup_embedding_semantic",
    oracle=f"""
    WITH RECURSIVE v AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        WHERE {EMB_VALID_SQL}
    ), c0 AS (SELECT vec_id AS cid, emb AS cvec FROM v WHERE vec_id < {K}),
    {_duck_assign('c0', 'a1')},
    {_duck_update('a1', 'c1')},
    {_duck_assign('c1', 'a2')},
    n AS (
        SELECT vec_id, emb, cid,
               sqrt({_DUCK_NORM2.format(a="emb")}) AS nrm
        FROM a2
    ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM n a JOIN n b ON a.vec_id < b.vec_id AND a.cid = b.cid
        WHERE {_PAIR_DUCK}
    ), edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION ALL
        SELECT vb, va FROM pairs
    ), walk AS (
        SELECT vec_id AS node, vec_id AS label FROM n
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    ), comp AS (
        SELECT node AS vec_id, MIN(label) AS component FROM walk GROUP BY node
    )
    SELECT n.vec_id, CAST(n.cid AS BIGINT) AS cluster, comp.component,
           CAST(COUNT(*) OVER (PARTITION BY comp.component) AS BIGINT)
               AS n_group,
           CAST(CASE WHEN n.vec_id = comp.component THEN 1 ELSE 0 END
                AS INTEGER) AS keep
    FROM n JOIN comp USING (vec_id)
    """,
)
def dedup_embedding_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings (trained artifact), score
    cosine pairs only within clusters, connected-component the ≥ SEM_TAU
    pair graph, keep the minimum vec_id per component.  Output per vector:
    its coarse cluster, its duplicate-group label, the group size, and the
    keep decision — the drop set is ``keep = 0``.

    The oracle retrains the quantizer from scratch in unrolled SQL (the
    kmeans_assign CTEs), recomputes every within-cluster pair, and labels
    components with a recursive CTE — green proves the full composition:
    trainer, artifact serving, grouped-matmul verifier, and star
    contraction agree with the sequential-fold definition end to end."""
    assigned = trained_assignment(spark, sf_dir)
    labels = connected_components(
        assigned.select(F.col("vec_id").alias("doc_id")),
        semantic_edges(assigned))[0]
    w = Window.partitionBy("component")
    return (assigned.select("vec_id", F.col("cid").cast("bigint")
                            .alias("cluster"))
            .join(labels.withColumnRenamed("doc_id", "vec_id"), "vec_id")
            .select("vec_id", "cluster", "component",
                    F.count(F.lit(1)).over(w).cast("bigint").alias("n_group"),
                    (F.col("vec_id") == F.col("component")).cast("int")
                    .alias("keep")))
