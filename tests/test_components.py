"""Connected-components contraction: correctness, round count, convergence guard.

The near-dup clustering oracle (dedup_components) only exercises quasi-clique
graphs; these tests pin the properties that matter at scale — logarithmic round
count on an adversarial long chain, and refusal to return unconverged labels.
"""

from __future__ import annotations

import math

import pytest

from alertas_spark.operators.dedup import connected_components

CHAIN_N = 200  # min-label propagation would need ~CHAIN_N rounds (cap is 25)


def _chain(spark, n):
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    edges = (spark.range(n - 1)
             .selectExpr("id AS src", "id + 1 AS dst"))
    return nodes, edges


def test_long_chain_converges_logarithmically(spark):
    nodes, edges = _chain(spark, CHAIN_N)
    labels, rounds = connected_components(nodes, edges)
    rows = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(CHAIN_N)}
    # star contraction roughly halves the diameter per round; allow slack but
    # pin the logarithmic order (plain propagation would need ~CHAIN_N rounds)
    assert rounds <= 3 * int(math.log2(CHAIN_N)) + 2, rounds


def test_two_components_and_isolated_nodes(spark):
    nodes = spark.range(10).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(3, 1), (1, 2), (7, 8), (8, 6)], "src long, dst long")
    labels, _ = connected_components(nodes, edges)
    rows = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert rows == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 6, 8: 6, 9: 9}


def test_unconverged_raises_instead_of_returning_wrong_labels(spark):
    nodes, edges = _chain(spark, CHAIN_N)
    with pytest.raises(RuntimeError, match="unconverged"):
        connected_components(nodes, edges, max_iters=1)


def test_empty_edge_set_short_circuits(spark):
    nodes = spark.range(5).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame([], "src long, dst long")
    labels, rounds = connected_components(nodes, edges)
    assert rounds == 0
    assert all(r["doc_id"] == r["component"] for r in labels.collect())


SF = "/root/testdata/sf0.001"


def test_cluster_representative_invariants(spark):
    """rep = longest copy (ties → min doc_id), one rep per component, sizes
    account for every document — checked against the raw component labels."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.dedup import (
        _minhash_pairs, connected_components, dedup_cluster_representative)
    from alertas_spark.sources.catalog import load_table

    reps = dedup_cluster_representative(spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    pairs = _minhash_pairs(spark, SF).select("doc_a", "doc_b")
    labels, _ = connected_components(
        docs.select("doc_id"), pairs.selectExpr("doc_a AS src", "doc_b AS dst"))
    by_comp = {}
    chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    for r in labels.collect():
        by_comp.setdefault(r["component"], []).append(r["doc_id"])

    assert len(reps) == len(by_comp)  # exactly one rep per component
    assert sum(r["cluster_size"] for r in reps) == len(chars)  # partition of corpus
    for r in reps:
        members = by_comp[r["component"]]
        assert r["cluster_size"] == len(members)
        best = min(members, key=lambda d: (-chars[d], d))
        assert r["rep_doc_id"] == best
        assert r["rep_n_chars"] == chars[best]


def test_pagerank_mass_conservation_and_support(spark):
    """PageRank sanity the oracle can't see: every node keeps a rank, total
    mass stays ~1 (the graph has no dangling nodes by construction — both
    directions of every trade edge exist), and ranks are positive."""
    from alertas_spark.operators.graph import pagerank_trade_graph

    SF = "/root/testdata/sf0.001"
    rows = pagerank_trade_graph(spark, SF).collect()
    assert len(rows) > 0
    total = sum(r.rank for r in rows)
    # quantization to 12 decimals loses at most n*5e-13 of mass per round
    assert abs(total - 1.0) < 1e-6, total
    assert all(r.rank > 0 for r in rows)
    # bipartite: both customer and supplier nodes present
    kinds = {r.node[0] for r in rows}
    assert kinds == {"c", "s"}
