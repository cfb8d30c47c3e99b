"""Streaming ⇄ batch equivalence for the event operators.

Full replay of the events table through Structured Streaming must reproduce the batch
operators exactly: same windows, same session splits, same totals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertas_spark.streaming import events as ev

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream(spark):
    return ev.read_events_stream(spark, SF_DIR)


def test_tumbling_equals_batch(spark, stream):
    from alertas_spark.operators.sessionize import events_tumbling_5min

    got = ev.run_to_memory(ev.tumbling_counts(stream)).toPandas()
    want = events_tumbling_5min(spark, SF_DIR).toPandas()
    key = ["bucket_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["n_events"]].equals(want[key + ["n_events"]])
    assert (got["total_value"] - want["total_value"]).abs().max() == 0


def test_session_window_matches_batch_session_count(spark, stream):
    from alertas_spark.operators.sessionize import events_sessionize

    got = ev.run_to_memory(ev.session_aggregates(stream))
    batch = events_sessionize(spark, SF_DIR)
    g = got.groupBy("user_id").agg(F.count("*").alias("n_sessions")).toPandas()
    b = batch.groupBy("user_id").agg(F.count("*").alias("n_sessions")).toPandas()
    g = g.sort_values("user_id").reset_index(drop=True)
    b = b.sort_values("user_id").reset_index(drop=True)
    assert g.equals(b)


def test_stateful_running_totals(spark, stream):
    got = ev.run_to_memory(ev.user_running_totals(stream), output_mode="update")
    # final state per user (last update) must equal the batch aggregate
    final = (got.groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"),
                  F.max("total_value").alias("total_value")).toPandas())
    want = (spark.read.parquet(f"{SF_DIR}/events.parquet")
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")).toPandas())
    final = final.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert final["n_events"].equals(want["n_events"])
    assert (final["total_value"] - want["total_value"]).abs().max() < 1e-6
