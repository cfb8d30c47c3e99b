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
    late=True,  # relational-technique demo; unique ops hold the window slots
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
    order date — a genuine big×big range join, executed as a binned equi-join:
    intervals explode onto ≤2 week-bins, points map to one bin, the join key is the
    bin id, and the exact range predicate filters after the match.  `.explain` shows
    an equi-join on the bin key (broadcast at small SF via AQE, sort-merge at scale)
    — NOT the BroadcastNestedLoopJoin the raw range predicate would force."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_orderdate").cast("timestamp").alias("start_ts"))
        .withColumn("start_bin", (F.unix_timestamp("start_ts") / _BIN_SECONDS)
                    .cast("long"))
        # an interval of exactly one bin width overlaps its start bin and maybe the next
        .withColumn("bin", F.explode(F.array(F.col("start_bin"),
                                             F.col("start_bin") + 1)))
        .drop("start_bin")
    )
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_shipdate").cast("timestamp").alias("ship_ts"))
        .withColumn("bin", (F.unix_timestamp("ship_ts") / _BIN_SECONDS).cast("long"))
    )
    matched = (
        orders.join(items, "bin")
        .filter((F.col("ship_ts") >= F.col("start_ts"))
                & (F.col("ship_ts") < F.col("start_ts")
                   + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")))
    )
    return (
        matched.groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped"),
             F.min("ship_ts").cast("date").cast("string").alias("first_ship"))
    )
