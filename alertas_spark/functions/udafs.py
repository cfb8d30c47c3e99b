"""Custom aggregates via Arrow-vectorized grouped-agg pandas UDFs (§2.8).

The engine's rule is built-ins first (every hot-path aggregate in the corpus is
a JVM expression); this module is the sanctioned escape hatch for aggregates
Spark genuinely lacks, demonstrated with a 10%-trimmed mean.  The shape to
copy: grouped-agg ``pandas_udf`` (whole group arrives as one Arrow batch — for
bounded-cardinality groups only), NEVER a row-at-a-time Python UDF.

Cross-engine determinism inside a Python UDF follows the same contract as
``functions/numeric.py``: quantize each kept value to DECIMAL-6 exactly as the
engines' double→decimal cast does (HALF_UP on the exact binary value), sum the
resulting integers (exact, order-independent), convert once back to double.
The final ROUND stays OUTSIDE the UDF as a Spark expression (Python ``round``
is half-even; SQL ROUND is half-away).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: fraction trimmed from EACH tail (rank-based: k = floor(n·q) rows per side)
TRIM_Q = 0.1

_SIX = Decimal("0.000001")


def _make_trimmed_mean():
    """Build the UDF lazily: ``pandas_udf`` needs an active SparkSession, and
    registry import must work without one (the driver imports ``queries()``
    before handing us a session)."""

    @pandas_udf("double")
    def _trimmed_mean(v: pd.Series) -> float:  # pragma: no cover - executor
        # finite-only domain (matches functions/numeric.finite and the
        # builtin tier): a NaN order value is a data error, not an order
        # statistic — Decimal(nan) would raise here, and NaN sorts
        # engine-divergently in the rank formulation
        x = sorted(val for val in v.dropna().tolist() if math.isfinite(val))
        if not x:
            return None
        # floor(n·q) via the same double multiply both engines evaluate
        k = int(math.floor(len(x) * TRIM_Q))
        kept = x[k:len(x) - k] if k else x
        # exact decimal-6 accumulation (HALF_UP quantize == the engines'
        # double→DECIMAL(29,6) cast), then ONE conversion back to double
        total = sum(Decimal(val).quantize(_SIX, rounding=ROUND_HALF_UP)
                    for val in kept)
        return float(total) / len(kept)

    return _trimmed_mean


@declare(
    "trimmed_mean_order_value",
    oracle=f"""
    WITH j AS (
        SELECT c_mktsegment, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE isfinite(o_totalprice)
    ), r AS (
        SELECT c_mktsegment, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice) AS rn,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM j
    )
    SELECT c_mktsegment,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*), 6) AS trimmed_mean
    FROM r
    WHERE rn > FLOOR(n * {TRIM_Q}) AND rn <= n - FLOOR(n * {TRIM_Q})
    GROUP BY c_mktsegment
    """,
)
def trimmed_mean_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean order value per market segment through the custom
    UDAF — the robust-statistics aggregate Spark has no built-in for.

    Rank-based trim (drop the ``floor(n·0.1)`` smallest and largest rows):
    ties at the boundary keep the same VALUE multiset whichever tied row the
    oracle's ROW_NUMBER discards, so the rank formulation is deterministic
    without a tiebreak column.  The UDF sorts its group, so the result is
    partition-layout independent (pinned in test_partition_invariance).

    Scale note: a grouped-agg pandas UDF materializes each group as one Arrow
    batch — correct for bounded group counts (5 segments); for
    high-cardinality keys use a two-pass built-in formulation (window rank +
    filter + decimal agg, exactly the oracle's plan) instead."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (j.groupBy("c_mktsegment")
            .agg(F.round(_make_trimmed_mean()(F.col("o_totalprice")), 6)
                 .alias("trimmed_mean")))


def builtin_trimmed_mean(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """The documented SCALE formulation of the trimmed mean, in pure
    built-ins: ROW_NUMBER + per-group COUNT windows rank each value, the
    trim filter drops ``floor(n·q)`` rows per tail, and the kept values
    aggregate through the decimal contract (exact, order-independent).

    Two shuffles (one window sort, one hash agg), zero Python — unlike the
    grouped-agg pandas UDF above, nothing materializes a whole group in one
    Arrow batch, so this is the shape for high-cardinality keys (per-customer,
    per-document, ...).  Ties at the trim boundary keep the same VALUE
    multiset whichever tied row ROW_NUMBER discards, so no tiebreak column is
    needed for determinism."""
    from pyspark.sql.window import Window

    from alertas_spark.functions.numeric import finite

    df = df.filter(finite(F.col(value)).isNotNull())  # finite-only domain
    w_rank = Window.partitionBy(*keys).orderBy(value)
    w_all = Window.partitionBy(*keys)
    ranked = df.select(*keys, value,
                       F.row_number().over(w_rank).alias("rn"),
                       F.count("*").over(w_all).alias("n"))
    k = F.floor(F.col("n") * F.lit(TRIM_Q))
    kept = ranked.filter((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    return (kept.groupBy(*keys)
            .agg(F.round(F.sum(F.col(value).cast("decimal(29,6)"))
                         .cast("double") / F.count("*"), 6)
                 .alias("trimmed_mean")))


@declare(
    "trimmed_mean_order_value_builtin",
    oracle=f"""
    WITH r AS (
        SELECT o_custkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice) AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders WHERE isfinite(o_totalprice)
    )
    SELECT o_custkey,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*), 6) AS trimmed_mean
    FROM r
    WHERE rn > FLOOR(n * {TRIM_Q}) AND rn <= n - FLOOR(n * {TRIM_Q})
    GROUP BY o_custkey
    """,
)
def trimmed_mean_order_value_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean order value PER CUSTOMER — the high-cardinality tier
    of the same aggregate as ``trimmed_mean_order_value`` (5 bounded segments
    → pandas UDAF; ~one group per customer → this pure built-in window
    formulation; tests pin the two hash-equal on the segment grouping)."""
    orders = load_table(spark, sf_dir, "orders")
    return builtin_trimmed_mean(
        orders.select("o_custkey", "o_totalprice"),
        ["o_custkey"], "o_totalprice")
