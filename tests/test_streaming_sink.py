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
