"""Data profiling — per-column statistics for pipeline QA.

A training-data pipeline's first pass over a new source: row counts, null rates,
distinct counts, range, quantiles, spread — one output row per profiled column.
Spark's ``percentile``/``stddev_samp`` and DuckDB's ``quantile_cont``/``stddev_samp``
use the same interpolation/Welford formulations, so the oracle comparison is exact.

At scale: one pass over the table, all statistics in a single partial+final hash
aggregate (no shuffle beyond the 1-row merge); exact percentiles buffer per-partition
sorted values — swap for ``approx_percentile`` at 100 TB (documented knob, not the
verification path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _duck_profile(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           COUNT({col}) AS n,
           COUNT(*) - COUNT({col}) AS n_null,
           COUNT(DISTINCT {col}) AS n_distinct,
           ROUND(MIN({col}), 6) AS min_v,
           ROUND(MAX({col}), 6) AS max_v,
           ROUND(quantile_cont({col}, 0.5), 6) AS p50,
           ROUND(quantile_cont({col}, 0.95), 6) AS p95,
           ROUND(stddev_samp({col}), 6) AS sd
    FROM lineitem
    """


@declare(
    "profile_columns",
    oracle=" UNION ALL ".join(_duck_profile(c) for c in _COLS),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric column profile of lineitem: count/nulls/distinct/min/max/p50/p95/sd,
    one row per column."""
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS)
    # Two single-row aggregates over the scan, then explode per-column structs:
    # the plain stats in one pass, the distinct counts in a second — mixing N
    # countDistincts with percentile buffers in one aggregate makes Catalyst EXPAND
    # the input N+1× underneath the sort buffers (measured 60% slower).
    aggs = []
    for c in _COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.round(F.min(c), 6).alias(f"{c}__min_v"),
            F.round(F.max(c), 6).alias(f"{c}__max_v"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias(f"{c}__p50"),
            F.round(F.expr(f"percentile({c}, 0.95)"), 6).alias(f"{c}__p95"),
            F.round(F.stddev_samp(c), 6).alias(f"{c}__sd"),
        ]
    distincts = li.agg(*[F.countDistinct(c).alias(f"{c}__n_distinct") for c in _COLS])
    wide = li.agg(*aggs).crossJoin(distincts)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_v").alias("min_v"),
            F.col(f"{c}__max_v").alias("max_v"),
            F.col(f"{c}__p50").alias("p50"),
            F.col(f"{c}__p95").alias("p95"),
            F.col(f"{c}__sd").alias("sd"),
        ) for c in _COLS
    ])
    return wide.select(F.explode(structs).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Winsorization: clip to corpus percentiles (two-pass scalar broadcast)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.01
WINSOR_HI = 0.99


@declare(
    "winsorize_values",
    oracle=f"""
    WITH bounds AS (
        SELECT quantile_cont(value, {WINSOR_LO}) AS lo,
               quantile_cont(value, {WINSOR_HI}) AS hi
        FROM events
    )
    SELECT event_id,
           ROUND(LEAST(GREATEST(value, lo), hi), 6) AS value_clipped,
           CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END AS clipped
    FROM events, bounds
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize the event value to the corpus [p1, p99] — the two-pass outlier
    pattern: one aggregation pass computes the exact percentile bounds (a 1-row
    frame), which then CROSS-JOIN-BROADCASTS onto the full table for the clip (the
    J7 scalar-broadcast idiom — no driver round-trip, no second shuffle).  At
    100 TB swap the exact percentile for approx_percentile; the plan shape is
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr(f"percentile(value, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(value, {WINSOR_HI})").alias("hi"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6)
            .alias("value_clipped"),
            F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
            .otherwise(0).alias("clipped"),
        )
    )
