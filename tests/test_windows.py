"""Semantic pins for the window / multi-dimensional aggregation module
(plans/windows.py) beyond the DuckDB oracle: structural invariants that would
not necessarily fail a value-hash if the operator were subtly wrong."""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _run(spark, name: str):
    from alertas_spark.registry import load_all

    return load_all()[name].builder(spark, SF)


def test_rollup_set_structure(spark):
    """ROLLUP(a, b) emits exactly the (a,b), (a), () sets: gid ∈ {0, 1, 3}, one
    grand-total row, and the marginals re-add to the grand total."""
    rows = _run(spark, "rollup_priority_status").collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 3}
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    per_priority = sum(r["n_orders"] for r in rows if r["gid"] == 1)
    assert per_priority == total[0]["n_orders"]


def test_cube_adds_the_fourth_set(spark):
    """CUBE(a, b) = ROLLUP sets + the (b) marginal: gid ∈ {0, 1, 2, 3}."""
    rows = _run(spark, "cube_priority_segment").collect()
    assert {r["gid"] for r in rows} == {0, 1, 2, 3}


def test_grouping_sets_exactly_the_declared_sets(spark):
    """GROUPING SETS ((a),(b),()) must NOT contain the (a,b) cross set."""
    rows = _run(spark, "grouping_sets_orders").collect()
    assert {r["gid"] for r in rows} == {1, 2, 3}


def test_ntile_is_a_balanced_partition_of_each_segment(spark):
    """NTILE(4): every customer gets exactly one tile and tile sizes within a
    segment differ by at most 1."""
    from collections import Counter

    rows = _run(spark, "ntile_customer_quartiles").collect()
    seg_tiles: Counter = Counter((r["c_mktsegment"], r["quartile"]) for r in rows)
    segs = {r["c_mktsegment"] for r in rows}
    for seg in segs:
        sizes = [seg_tiles[(seg, q)] for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1


def test_running_total_last_row_equals_group_sum(spark):
    """The final running_spend per customer must equal the plain grouped dsum —
    the frame accumulation and the hash aggregate share one decimal contract."""
    from pyspark.sql import functions as F

    from alertas_spark.functions.numeric import dsum
    from alertas_spark.sources.catalog import load_table

    rt = _run(spark, "running_total_per_customer")
    last = (rt.groupBy("o_custkey")
            .agg(F.max_by("running_spend", "nth_order").alias("final_spend")))
    expected = (load_table(spark, SF, "orders").groupBy("o_custkey")
                .agg(dsum(F.col("o_totalprice")).alias("total")))
    diff = (last.join(expected, "o_custkey")
            .filter(F.col("final_spend") != F.col("total")).count())
    assert diff == 0


def test_funnel_counts_are_monotone(spark):
    row = _run(spark, "funnel_view_click_purchase").collect()[0]
    assert row["n_view"] >= row["n_view_click"] >= row["n_view_click_purchase"]
    assert row["n_view"] > 0


def test_percentile_interpolation_bit_equal_to_quantile_cont(spark):
    """The equi-depth histogram's boundary contract (plans/windows.py): Spark
    ``percentile(v, [.25,.5,.75])`` and DuckDB ``quantile_cont`` must produce
    BIT-EQUAL boundary doubles, or a value within an ulp of a boundary flips a
    bucket count between engines.  Crafted 8-value set: every quartile index
    (p*(n-1) = 1.75 / 3.5 / 5.25) lands between elements whose interpolant is
    NOT exactly representable, so any difference in interpolation expression
    order (lo + (hi-lo)*f  vs  lo*(1-f) + hi*f) shows up in the last bit."""
    import struct

    import duckdb
    from pyspark.sql import functions as F

    vals = [0.1, 0.2, 1.0 / 3.0, 0.7, 1.1, 2.2, 7.7, 1e15 + 0.1]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = df.agg(F.percentile(F.col("v"), F.lit([0.25, 0.5, 0.75]))
               .alias("qs")).collect()[0].qs
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    for v in vals:
        con.execute("INSERT INTO t VALUES (?)", [v])
    d = con.execute("SELECT quantile_cont(v, 0.25), quantile_cont(v, 0.50),"
                    " quantile_cont(v, 0.75) FROM t").fetchone()
    bits = lambda x: struct.pack("<d", x)
    assert [bits(a) for a in s] == [bits(b) for b in d], (s, d)
