"""Production streaming sink: parquet + checkpoint, exactly-once across restarts.

run_to_memory is the test bridge; production streams write to a file sink with a
checkpoint.  These tests pin the two properties that matter operationally: the sink
holds exactly the batch-equivalent rows after a full replay, and RESTARTING the same
query against the same checkpoint adds nothing (file-sink exactly-once via the
commit log) — the property that makes nightly stream jobs idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _run_once(spark, sf_dir: str, out_dir: str, ckpt_dir: str) -> None:
    from alertas_spark.streaming import events as ev

    # file sinks take append mode; landing the enriched raw stream is the
    # production shape (complete-mode aggregates can't feed a file sink)
    stream = ev.read_events_stream(spark, sf_dir).withColumn(
        "value_2x", F.col("value") * 2)
    q = (stream.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    _run_once(spark, sf_dir, out, ckpt)
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_batch

    # restart against the same checkpoint: no new input → no new rows, no dupes
    _run_once(spark, sf_dir, out, ckpt)
    assert spark.read.parquet(out).count() == n_batch

    # the checkpoint's commit log is what makes this exactly-once
    assert os.path.isdir(os.path.join(ckpt, "commits"))


def test_foreachbatch_upsert_across_micro_batches(spark, tmp_path):
    """Force MULTIPLE micro-batches (maxFilesPerTrigger=1 over a two-file source)
    through the stateful per-user totals in update mode; the upsert snapshot must
    end up equal to the one-shot batch aggregate — keys updated in batch 2 must
    REPLACE their batch-1 rows, not duplicate them."""
    import os

    from alertas_spark.sources.catalog import normalize_event_ts
    from alertas_spark.streaming import events as ev
    from alertas_spark.streaming.sinks import upsert_stream_to_snapshot

    src = "/root/testdata/sf0.001/events.parquet"
    two_files = tmp_path / "two"
    two_files.mkdir()
    os.symlink(src, two_files / "a.parquet")
    os.symlink(src, two_files / "b.parquet")

    schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(two_files)))
    totals = ev.user_running_totals(stream)

    snap = str(tmp_path / "snapshot")
    upsert_stream_to_snapshot(totals, ["user_id"], snap,
                              str(tmp_path / "ckpt"))

    got = {(r.user_id, r.n_events, r.total_value)
           for r in spark.read.parquet(snap).collect()}

    # oracle: the doubled input aggregated in one shot, with the same decimal
    # contract as the stateful accumulator
    from pyspark.sql import functions as F

    from alertas_spark.functions.numeric import dsum

    doubled = spark.read.parquet(str(two_files))
    want = {(r.user_id, r.n_events, r.total_value)
            for r in doubled.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 dsum(F.col("value"), 4).alias("total_value")).collect()}
    assert got == want

    # snapshot holds exactly one row per key (upsert, not append)
    n_users = doubled.select("user_id").distinct().count()
    assert spark.read.parquet(snap).count() == n_users

    # restart against the same checkpoint: no new input, snapshot unchanged
    stream2 = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(two_files)))
    upsert_stream_to_snapshot(ev.user_running_totals(stream2), ["user_id"], snap,
                              str(tmp_path / "ckpt"))
    assert {(r.user_id, r.n_events, r.total_value)
            for r in spark.read.parquet(snap).collect()} == want


def test_snapshot_swap_survives_crash_windows(spark, tmp_path):
    """The two-rename swap must leave a complete snapshot recoverable from EVERY
    crash state — in particular the window the old rmtree+rename scheme lost:
    dying between 'remove current snapshot' and 'promote staging', where a
    replayed batch would have found no snapshot and silently dropped all
    previously-merged keys."""
    import shutil

    from alertas_spark.streaming.sinks import (merge_batch_into_snapshot,
                                               recover_snapshot)

    snap = str(tmp_path / "snap")
    old, staging = snap + ".old", snap + ".staging"

    def rows():
        return {(r.k, r.v) for r in spark.read.parquet(snap).collect()}

    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge_batch_into_snapshot(b1, ["k"], snap)
    assert rows() == {(1, "a"), (2, "b")}

    # crash state 1: died between the renames (snapshot gone, .old intact).
    shutil.copytree(snap, old)
    shutil.rmtree(snap)
    recover_snapshot(snap)
    assert rows() == {(1, "a"), (2, "b")}

    # crash state 2: died after promote, before cleanup (.old is stale leftover).
    shutil.copytree(snap, old)
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    merge_batch_into_snapshot(b2, ["k"], snap)  # runs recovery itself
    assert rows() == {(1, "a"), (2, "B"), (3, "c")}
    assert not shutil.os.path.exists(old)

    # crash state 3: leftover partial .staging is untrusted and replaced.
    shutil.os.makedirs(staging)
    with open(shutil.os.path.join(staging, "garbage"), "w") as fh:
        fh.write("not parquet")
    b3 = spark.createDataFrame([(4, "d")], "k int, v string")
    merge_batch_into_snapshot(b3, ["k"], snap)
    assert rows() == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    assert not shutil.os.path.exists(staging) and not shutil.os.path.exists(old)

    # replay semantics after crash state 1: the batch that was mid-merge re-merges
    # idempotently against the restored snapshot (batch rows win on collision).
    shutil.copytree(snap, old)
    shutil.rmtree(snap)
    merge_batch_into_snapshot(b3, ["k"], snap)
    assert rows() == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
