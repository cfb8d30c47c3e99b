"""Bucketed co-located joins: the pre-shuffle strategy for repeated big-big joins.

At 100 TB, a join that both sides pay a shuffle for on every run should instead be
bucketed once at write time (`bucketBy` on the join key): Spark then plans a
SortMergeJoin with NO Exchange on either side.  This test proves the property on the
testdata star schema — plan-level (no Exchange operators) and result-level (equal to
the plain join)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_session(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{wh}'")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("buckets.orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("buckets.lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckets.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckets")


def _plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(bucketed_session):
    spark = bucketed_session
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.sql("""
            SELECT o_orderkey, o_custkey, l_linenumber, l_quantity
            FROM buckets.orders_b JOIN buckets.lineitem_b ON o_orderkey = l_orderkey
        """)
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan

        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
