"""Date/time scalar functions (SURVEY §2.7) — the reference workload's core domain.

Every ``current_date()``/``now()`` call site in the reference (14+, SURVEY §2.7) becomes
an injectable ``as_of`` parameter here so results are deterministic and testable —
the reference's wall-clock entanglement is its single biggest testability defect
(SURVEY §7 risk register).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: The injected "today" for all date-relative predicates (≙ current_date()).
AS_OF = dt.date(2002, 1, 1)


@declare(
    "date_kitchen_sink",
    oracle=f"""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')              AS plus_30d,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')         AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') AS INTEGER)
                                                                             AS days_since,
           CAST(year(o_orderdate) AS INTEGER)                                AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                               AS order_month,
           strftime(o_orderdate, '%Y%m')                                     AS partition_ym,
           ROUND(date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') / 365.2425, 6)
                                                                             AS age_years
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def date_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: date_add / add_months / last_day / datediff / year / month / date_format /
    fractional-year division — all JVM builtins, 1:1 with the reference's usage
    (alerta_bdpa.py:91-92, alerta_prcr.py:90-91, alerta_abr1.py:32,37-38,
    jobs.py:296-297)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    as_of = F.lit(AS_OF.isoformat()).cast("date")
    return orders.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(as_of, d).cast("int").alias("days_since"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyyMM").alias("partition_ym"),
        F.round(F.datediff(as_of, d) / F.lit(365.2425), 6).alias("age_years"),
    )


@declare(
    "deadline_elapsed",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority,
           strftime(deadline, '%Y-%m-%d') AS deadline,
           CAST(date_diff('day', deadline, DATE '{AS_OF}') AS INTEGER) AS days_overdue
    FROM (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(o_orderdate AS DATE) + 30
                    ELSE CAST(CAST(o_orderdate AS DATE) + INTERVAL 6 MONTH AS DATE)
               END AS deadline
        FROM orders WHERE o_orderstatus = 'O'
    ) t
    WHERE deadline < DATE '{AS_OF}'
    """,
)
def deadline_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature pattern: deadline = event_date + offset, alert when
    as_of is past it (≙ PRCR prescription date alerta_prcr.py:159-167; BDPA deadline
    alerta_bdpa.py:91-92; elapsed-days alerta_dt2i.py:43) with as_of injected."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    as_of = F.lit(AS_OF.isoformat()).cast("date")
    deadline = F.when(F.col("o_orderpriority") == "1-URGENT", F.date_add(d, 30)).otherwise(
        F.add_months(d, 6))
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .withColumn("deadline", deadline)
        .filter(F.col("deadline") < as_of)
        .select(
            "o_orderkey", "o_orderpriority",
            F.date_format("deadline", "yyyy-MM-dd").alias("deadline"),
            F.datediff(as_of, F.col("deadline")).cast("int").alias("days_overdue"),
        )
    )
