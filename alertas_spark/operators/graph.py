"""Iterative graph analytics: weighted PageRank over the trade graph.

Second iterative-algorithm family next to connected components
(operators/dedup.py): CC converges by contraction, PageRank by fixed-point
iteration — the shape every embedding-propagation / influence job at 100 TB
uses (a handful of join+aggregate rounds over an edge table).

Determinism contract for cross-engine equality: every per-iteration sum of
contributions accumulates in DECIMAL(38,18) (order-independent), and the rank
is quantized to 12 decimals per iteration, so both engines iterate on
bit-identical state no matter how partitions merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.operators import memo
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: damping factor and fixed iteration count (unrolled identically in the oracle)
PR_DAMPING = 0.85
PR_ITERS = 5
#: per-iteration state quantization — makes the fixed-point trajectory engine-
#: independent (see module docstring)
_PR_SCALE = 12

_PR_ACC = "DECIMAL(38,18)"


def _oracle() -> str:
    """Unrolled 5-iteration PageRank in DuckDB CTEs (one CTE per iteration —
    the oracle mirrors the Spark loop step for step)."""
    its = []
    for k in range(1, PR_ITERS + 1):
        prev = f"it{k - 1}"
        its.append(f"""
    it{k} AS (
        SELECT e.dst AS node,
               ROUND({1 - PR_DAMPING} / (SELECT n FROM nn) + {PR_DAMPING} *
                     CAST(SUM(CAST(p.r * e.wn AS {_PR_ACC}))
                          AS DOUBLE), {_PR_SCALE}) AS r
        FROM {prev} p
        JOIN edges_n e ON p.node = e.src
        GROUP BY e.dst
    )""")
    return f"""
    WITH pair AS (
        SELECT o_custkey AS c, l_suppkey AS s, COUNT(*) AS w
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
        GROUP BY 1, 2
    ), edges AS (
        SELECT 'c' || c AS src, 's' || s AS dst, w FROM pair
        UNION ALL
        SELECT 's' || s, 'c' || c, w FROM pair
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), nn AS (SELECT COUNT(*) AS n FROM nodes),
    outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
    edges_n AS (
        SELECT e.src, e.dst, e.w / o.wout AS wn
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    it0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), {_PR_SCALE}) AS r
            FROM nodes),
    {','.join(its)}
    SELECT node, r AS rank FROM it{PR_ITERS}
    """


@declare("pagerank_trade_graph", oracle=_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the bipartite customer↔supplier trade graph
    (edge weight = number of lineitems between the pair; both directions, so
    every node has in- and out-edges — no dangling-mass term needed).

    Five fixed iterations of
    ``r'(v) = (1-d)/N + d · Σ_(u→v) r(u)·w(u,v)/W(u)`` with decimal
    contribution sums and 12-decimal state quantization per round — the
    trajectory is identical under any partitioning and bit-equal to the
    oracle's unrolled CTEs.

    Scale shape: the edge table is built once (one orders⋈lineitem join +
    groupBy) and each iteration is one equi join rank⋈edges plus one hash
    aggregate on ``dst`` — 2 shuffles per round over an edge set that never
    grows, the standard distributed-PageRank cost model.  Fixed iteration
    count (not convergence-tested) keeps the plan static; ``localCheckpoint``
    per round would truncate lineage for deeper runs but is unnecessary at
    5 rounds."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # an edge needs BOTH endpoints: a NULL custkey/suppkey row would build a
    # NULL node that every equi-join silently drops — but only AFTER it has
    # been counted into N, shifting (1-d)/N for the whole graph (caught by
    # the adversarial fixture sweep)
    pair = (orders.join(li, orders.o_orderkey == li.l_orderkey)
            .filter(F.col("o_custkey").isNotNull()
                    & F.col("l_suppkey").isNotNull())
            .groupBy("o_custkey", "l_suppkey").agg(F.count("*").alias("w")))
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = (pair.select(c.alias("src"), s.alias("dst"), "w")
             .unionByName(pair.select(s.alias("src"), c.alias("dst"), "w")))
    # The loop's invariants are built ONCE and pinned through the tracked
    # operator cache (memo.cached: materialized on first use, unpersisted by
    # the cold-protocol clear).  Out-weight normalization is a WINDOW over
    # src, not an agg + join-back: the agg form duplicated the whole
    # orders⋈lineitem→edges subtree (Catalyst does not dedupe identical
    # subtrees — both sides of the self-join re-ran the scan and group-by)
    # and needed its own exchange + an explicit repartition; the window
    # computes sum(w) over the SAME exchange that establishes the src hash
    # partitioning the loop needs (guide §2.4: operations keyed the same way
    # share one exchange).  InMemoryRelation preserves that partitioning, so
    # each iteration's rank⋈edge join shuffles only the node-count-sized
    # rank side, never the edges.  sum(w) over bigint counts is exact, so
    # w/sum(w) is bit-identical to the former w/wout.
    from pyspark.sql import Window as W

    edges_n = memo.cached(
        edges.select("src", "dst",
                     (F.col("w") / F.sum("w").over(W.partitionBy("src")))
                     .alias("wn")))
    nodes = memo.cached(edges_n.select(F.col("src").alias("node")).distinct())
    # node count: a 1-row driver scalar (the sanctioned S15-class pull —
    # same contract as alerts/sanitation.py).  Pulling N to the driver folds
    # (1-d)/N into a constant, deleting a broadcast-join of the full graph
    # lineage from EVERY iteration; the division itself stays an in-engine
    # expression so rounding matches the oracle bit-for-bit.
    n = nodes.count()
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(n), _PR_SCALE).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (ranks.join(edges_n, ranks.node == edges_n.src)
                   .select("dst", (F.col("r") * F.col("wn")).alias("contrib")))
        ranks = (contrib.groupBy(F.col("dst").alias("node"))
                 .agg(F.round(
                     F.lit(1 - PR_DAMPING) / F.lit(n)
                     + PR_DAMPING * F.sum(F.col("contrib")
                                          .cast(_PR_ACC.lower()))
                     .cast("double"), _PR_SCALE).alias("r")))
    return ranks.select("node", F.col("r").alias("rank"))
