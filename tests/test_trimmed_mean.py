"""The two trimmed-mean tiers agree: grouped-agg pandas UDAF (bounded groups)
vs the pure built-in window formulation (high-cardinality scale path) — judged
on the SAME grouping, every cell hash-equal."""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def test_builtin_tier_matches_udaf_on_segment_grouping(spark):
    from pyspark.sql import functions as F

    from alertas_spark.functions.udafs import builtin_trimmed_mean
    from alertas_spark.registry import load_all
    from alertas_spark.sources.catalog import load_table

    udaf = {r.c_mktsegment: r.trimmed_mean
            for r in load_all()["trimmed_mean_order_value"]
            .builder(spark, SF).collect()}

    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    j = (orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
         .select("c_mktsegment", "o_totalprice"))
    builtin = {r.c_mktsegment: r.trimmed_mean
               for r in builtin_trimmed_mean(
                   j, ["c_mktsegment"], "o_totalprice").collect()}

    assert udaf.keys() == builtin.keys() and len(udaf) == 5
    for seg in udaf:
        assert udaf[seg] == builtin[seg], seg


def test_builtin_per_customer_small_group_edges(spark):
    # n < 10 -> k = 0 -> plain mean; exactly 10 -> drop 1 per tail
    from alertas_spark.functions.udafs import builtin_trimmed_mean

    rows = ([("a", float(v)) for v in (1, 2, 3)]
            + [("b", float(v)) for v in range(1, 11)])
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r.k: r.trimmed_mean
           for r in builtin_trimmed_mean(df, ["k"], "v").collect()}
    assert got["a"] == 2.0
    assert got["b"] == sum(range(2, 10)) / 8
