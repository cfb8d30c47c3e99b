"""Projection / filter / scalar-expression operators (SURVEY §2.2, §2.7-§2.8).

Covers: P1 projection+rename, P2 withColumn derive, P4 SQL-string filter, P5/P7
column-expr + IN-list filters, P10 CASE ladders, P12 coalesce, P13 casts, F1 key hash
(md5/sha1 over concat_ws — ≙ reference ``uuidsha`` /root/reference/src/alertas/
utils.py:26-43), F2 slugify (≙ ``custom_slugify`` alerta_isps.py:27-34).

Scale notes: every query here is scan → narrow transforms (no shuffle except the final
aggregate where present); filters and projections reach the parquet scan via Catalyst
pushdown (verified with .explain in tests/bench).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.functions.numeric import dsum, sql_dsum
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
      AND l_discount > 0.05
      AND l_returnflag IN ('A', 'R')
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P4/P5/P7/P13: pushed-down filters + projection + per-row derivation
    (≙ alerta_bdpa.py:25,38 filter style; alerta_dt2i.py:34-35 isin)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .filter("l_discount > 0.05")  # SQL-string filter, ≙ P4
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor("l_quantity").cast("int").alias("qty_int"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            "l_returnflag",
        )
    )


@declare(
    "case_priority_buckets",
    oracle=f"""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS bucket,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def case_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 CASE ladder (≙ alerta_prcr.py:60-66 penalty ladder; jobs.py:213-236)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice")).alias("total_price"))
    )


@declare(
    "alert_key_hash",
    oracle="""
    SELECT o_orderkey,
           'ORD.' || CAST(o_orderkey AS VARCHAR) || '.' || CAST(o_custkey AS VARCHAR)
               AS alrt_key,
           md5('ORD.' || CAST(o_orderkey AS VARCHAR) || '.' || CAST(o_custkey AS VARCHAR))
               AS alrt_hash
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def alert_key_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: stable alert identity — hash(concat_ws('.', sigla, key, orgao))
    (≙ uuidsha utils.py:40-43 + key assembly jobs.py:266-271), as pure JVM builtins."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.concat_ws(".", F.lit("ORD"), F.col("o_orderkey").cast("string"),
                      F.col("o_custkey").cast("string"))
    return (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", key.alias("alrt_key"), F.md5(key).alias("alrt_hash"))
    )


@declare(
    "slugify",
    oracle="""
    SELECT p_partkey,
           TRIM(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug
    FROM part
    WHERE p_size >= 40
    """,
)
def slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: slugify as builtins (≙ dead-code custom_slugify alerta_isps.py:27-34,
    reimplemented without a Python UDF)."""
    part = load_table(spark, sf_dir, "part")
    slug = F.expr("btrim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-'), '-')")
    return part.filter(F.col("p_size") >= 40).select("p_partkey", slug.alias("slug"))


@declare(
    "coalesce_fallback_dates",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(COALESCE(
               CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderdate END,
               o_orderdate + INTERVAL 30 DAY
           ) AS DATE), '%Y-%m-%d') AS effective_date,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS priority
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def coalesce_fallback_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 first-non-null fallback chains (≙ guia date coalesce alerta_bdpa.py:62-69)."""
    orders = load_table(spark, sf_dir, "orders")
    eff = F.date_format(
        F.coalesce(
            F.when(F.col("o_orderstatus") == "F", F.lit(None)).otherwise(F.col("o_orderdate")),
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
        ).cast("date"),
        "yyyy-MM-dd",
    )
    prio = F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
                      F.lit("UNSPECIFIED"))
    return (
        orders.filter(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey", eff.alias("effective_date"), prio.alias("priority"))
    )
