"""Property-based (hypothesis) checks against pure-Python reference models.

The DuckDB oracles pin cross-engine equality on the fixed fixtures; these tests
attack the same operators with *generated* inputs — random graphs, random
weights — so shapes the fixtures never produce (self-loops, duplicate edges,
dense cliques glued to chains, empty inputs) are exercised against an
independently-written reference implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    roots: dict[int, int] = {}
    for x in range(n):
        r = find(x)
        roots[r] = min(roots.get(r, r), x)
    return {x: roots[find(x)] for x in range(n)}


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    edges = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        max_size=40))
    return n, edges


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_graphs())
def test_connected_components_matches_union_find(spark, graph):
    # self-loops, duplicate and reversed edges must all be absorbed; labels must
    # equal the canonical min-id component labeling of a sequential union-find
    from alertas_spark.operators.dedup import connected_components

    n, edges = graph
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    edf = spark.createDataFrame(edges or [], "src long, dst long") if edges else \
        spark.createDataFrame([], "src long, dst long")
    labels, _rounds = connected_components(nodes, edf)
    got = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert got == _union_find(n, edges)


@st.composite
def _keyed_rows(draw):
    # heavy-tailed key space: key 0 is hot by construction
    return draw(st.lists(
        st.tuples(st.sampled_from([0, 0, 0, 1, 2, 3, 7]),
                  st.integers(-1000, 1000)),
        min_size=1, max_size=60))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_keyed_rows())
def test_salted_agg_equals_plain_agg(spark, rows):
    # the salted two-phase decomposition must be invisible: exact integer sums
    # and counts per key, identical to the single-shuffle groupBy
    from pyspark.sql import functions as F

    from alertas_spark.functions.skew import salted_agg

    df = spark.createDataFrame(rows, "k long, v long")
    got = {(r["k"]): (r["s"], r["n"])
           for r in salted_agg(df, ["k"],
                               {"s": F.sum("v"), "n": F.count(F.lit(1))},
                               n_salts=4).collect()}
    want = {r["k"]: (r["s"], r["n"])
            for r in df.groupBy("k")
                       .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                       .collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_keyed_rows(),
       st.lists(st.tuples(st.sampled_from([0, 1, 2, 3, 9]),
                          st.text("abc", max_size=3)),
                max_size=8, unique_by=lambda t: t[0]))
def test_salted_join_equals_plain_join(spark, rows, dim):
    # replicate-small-side salting must produce exactly the plain inner join
    # (as multisets of rows), including hot keys and dim keys with no match
    from alertas_spark.functions.skew import salted_join

    big = spark.createDataFrame(rows, "k long, v long")
    small = (spark.createDataFrame(dim, "k long, name string") if dim
             else spark.createDataFrame([], "k long, name string"))
    got = sorted((r["k"], r["v"], r["name"])
                 for r in salted_join(big, small, "k", n_salts=3).collect())
    want = sorted((r["k"], r["v"], r["name"])
                  for r in big.join(small, "k").collect())
    assert got == want


def test_approx_profile_rank_error_is_bounded_at_sf01(spark):
    """profile_columns_approx is APPROXIMATE by contract past the oracle-gate
    scale: with accuracy=2e5 (the memory-bounded setting — see the APPROX_ACC
    memory model), a 600k-row column budgets n*eps = 3 ranks of error, so a
    percentile may land on a nearby discrete value but NEVER further.  This
    pins the bound: every sketch percentile equals an exact discrete quantile
    at a rank within the ceil(n*eps)+1 budget."""
    import math

    import duckdb

    from alertas_spark.operators.profiling import APPROX_ACC, _COLS
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.1"
    got = {r.column_name: r for r in
           load_all()["profile_columns_approx"].builder(spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    for c in _COLS:
        n = con.execute(f"SELECT COUNT({c}) FROM lineitem").fetchone()[0]
        budget = math.ceil(n / APPROX_ACC) + 1
        for q, field in ((0.5, "p50"), (0.95, "p95")):
            rank = int(q * n)  # quantile_disc's lower-rank convention, ~scale
            lo, hi = max(1, rank - budget), min(n, rank + budget + 1)
            neighbors = [round(v[0], 6) for v in con.execute(
                f"SELECT {c} FROM (SELECT {c}, ROW_NUMBER() OVER (ORDER BY {c})"
                f" AS r FROM lineitem) WHERE r BETWEEN {lo} AND {hi}"
            ).fetchall()]
            assert getattr(got[c], field) in neighbors, (c, field, neighbors)


def test_weighted_sample_prefers_heavy_documents(spark):
    """sample_weighted_topk is a WEIGHTED draw: the selected documents'
    mean weight must exceed the corpus mean (A-ES gives inclusion
    probability ~ weight), and the selection is exactly SAMPLE_K ranked
    rows with distinct ids."""
    from alertas_spark.operators.sampling import SAMPLE_K
    from alertas_spark.registry import load_all
    from alertas_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    got = load_all()["sample_weighted_topk"].builder(spark, sf).collect()
    assert len(got) == SAMPLE_K
    assert sorted(r.rnk for r in got) == list(range(1, SAMPLE_K + 1))
    assert len({r.doc_id for r in got}) == SAMPLE_K
    sample_mean = sum(r.n_chars for r in got) / len(got)
    corpus_mean = (load_table(spark, sf, "documents")
                   .agg({"n_chars": "avg"}).collect()[0][0])
    assert sample_mean > corpus_mean
