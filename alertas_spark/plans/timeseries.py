"""Time-series shapes: value-range window frames and date-spine gap filling.

Both are aggregate-then-window plans: the fact-table pass is a plain distributed
hash aggregate to daily grain, and only the calendar-bounded series (a few
thousand rows at ANY scale factor) flows into the unpartitioned window / spine
join — the same scale argument as ``moving_avg_daily_revenue``
(plans/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alertas_spark.functions.numeric import ACC, dsum, sql_dsum
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "trailing_revenue_range_frame",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS epoch_day,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY o_orderdate
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, revenue,
           ROUND(CAST(CAST(SUM(CAST(revenue AS DECIMAL(29,6))) OVER (
                 ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE), 2) AS trailing_7d
    FROM daily
    """,
)
def trailing_revenue_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-CALENDAR-day revenue via a RANGE window frame.

    A ROWS frame (``moving_avg_daily_revenue``) counts the previous 6 *rows*,
    which silently widens the window across calendar gaps; the RANGE frame
    bounds the frame by the ORDER-BY **value** (epoch day), so a day after a
    3-day gap sums only the days genuinely within the last week.  Spark's
    ``rangeBetween`` needs a numeric ordering column — days-since-epoch, the
    same key the oracle ranges over.  Decimal accumulation keeps the frame
    sums order-independent."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderdate").alias("day"))
             .agg(dsum(F.col("o_totalprice")).alias("revenue"))
             .withColumn("epoch_day",
                         F.datediff("day", F.lit("1970-01-01"))))
    w = Window.orderBy("epoch_day").rangeBetween(-6, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "revenue",
        F.round(F.sum(F.col("revenue").cast(ACC)).over(w).cast("double"), 2)
         .alias("trailing_7d"),
    )


@declare(
    "daily_revenue_gap_filled",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ), prios AS (
        SELECT DISTINCT o_orderpriority FROM orders
    ), daily AS (
        SELECT o_orderdate AS day, o_orderpriority,
               {sql_dsum('o_totalprice')} AS revenue, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderdate, o_orderpriority
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, p.o_orderpriority,
           COALESCE(d.revenue, 0.0) AS revenue,
           COALESCE(d.n_orders, 0) AS n_orders
    FROM spine s CROSS JOIN prios p
    LEFT JOIN daily d ON d.day = s.day AND d.o_orderpriority = p.o_orderpriority
    """,
)
def daily_revenue_gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue per order priority: a generated date spine × the
    priority dimension, left-joined to the sparse daily aggregate with
    zero-fill — the canonical gap-fill before any time-series model sees the
    data (a missing day must read as 0, not as absent).

    Scale shape: the spine is calendar-bounded (≈2.4k days × 5 priorities
    regardless of scale factor) and comes from a 1-row global MIN/MAX
    aggregate, so the cross join is broadcast-trivial; the fact table
    contributes one distributed daily aggregate and one equi join."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(F.min("o_orderdate").alias("lo"),
                        F.max("o_orderdate").alias("hi"))
    spine = bounds.select(F.explode(F.sequence(
        "lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"))
    prios = orders.select("o_orderpriority").distinct()
    daily = (orders.groupBy(F.col("o_orderdate").alias("day"),
                            "o_orderpriority")
             .agg(dsum(F.col("o_totalprice")).alias("revenue"),
                  F.count("*").alias("n_orders")))
    return (
        spine.crossJoin(prios)
        .join(daily, ["day", "o_orderpriority"], "left")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                "o_orderpriority",
                F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
                F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )
