"""Declared queries that execute the streaming operators end-to-end.

``streaming_tumbling_5min`` replays the whole events table through a real
Structured Streaming query (file source → watermark → window agg → memory sink,
availableNow trigger) and is checked against the SAME DuckDB oracle as the batch
operator — full-replay complete-mode output is definitionally equal to the batch
aggregation.  ``streaming_user_totals`` exercises the custom stateful operator
(rows-only check: state-store output is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from alertas_spark.functions.numeric import sql_dsum
from alertas_spark.registry import declare
from alertas_spark.streaming import events as ev


@declare(
    "streaming_tumbling_5min",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S')
               AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation, replayed to completion."""
    return ev.run_to_memory(ev.tumbling_counts(ev.read_events_stream(spark, sf_dir)))


@declare("streaming_user_totals")  # stateful → rows-only check
def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user running totals (custom stateful operator)."""
    return ev.run_to_memory(
        ev.user_running_totals(ev.read_events_stream(spark, sf_dir)),
        output_mode="update", shuffle_partitions=8)
