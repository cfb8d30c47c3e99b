"""Set operations & unpivot (SURVEY §2.6).

U1 — the reference unpivots 4 indicator columns into rows with 4× UNION ALL over the
same scan (alerta_isps.py:78-92,113-127,152-166); the rebuild uses ``unpivot`` (one scan,
no union).  U3/U4 — union + distinct, name-based instead of positional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.functions.numeric import davg, sql_davg
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "unpivot_measures",
    oracle=f"""
    WITH m AS (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, COUNT(*) AS n, {sql_davg('val')} AS avg_val
    FROM m GROUP BY measure
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unpivot (single scan) replaces the reference's 4× UNION ALL of the same
    table (alerta_isps.py:78-92) — same rows, ¼ the I/O."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ids=[],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .groupBy("measure")
        .agg(F.count("*").alias("n"), davg(F.col("val")).alias("avg_val"))
    )


@declare(
    "union_distinct_keys",
    oracle="""
    SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 2
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/U4: union + distinct, name-based (the reference unions positionally —
    alerta_gate.py:38, jobs.py:312 — fragile under schema drift, SURVEY §7)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    asia = (
        cust.join(F.broadcast(nation.filter(F.col("n_regionkey") == 2)),
                  cust.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey")
    )
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return asia.unionByName(rich).distinct()


@declare(
    "customer_cohort_set_ops",
    oracle="""
    WITH c95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
    ), c96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_custkey, 'retained' AS cohort FROM (
        SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
    UNION ALL
    SELECT o_custkey, 'churned' AS cohort FROM (
        SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)
    """,
)
def customer_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over yearly purchase cohorts: customers active in
    both 1995 and 1996 (retained) and in 1995 only (churned), labeled in one
    result.  Both set operators compile to the same plan family as the anti /
    semi joins (J9/J12) — a distinct aggregate feeding a hash join on the full
    row — so they inherit the scale story of the join they desugar to; the
    year filters are pushed to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return (orders.filter((F.col("o_orderdate") >= f"{y}-01-01")
                              & (F.col("o_orderdate") < f"{y + 1}-01-01"))
                .select("o_custkey").distinct())

    c95, c96 = year(1995), year(1996)
    return (
        c95.intersect(c96).withColumn("cohort", F.lit("retained"))
        .unionByName(c95.subtract(c96).withColumn("cohort", F.lit("churned")))
    )
