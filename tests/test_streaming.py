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


def test_state_accumulator_is_lossless_across_micro_batches(spark, tmp_path):
    # Magnitudes where double spacing (~1.5e-5 at 1.2e11) exceeds the 1e-6
    # quantum: a double-typed state accumulator would come back from the state
    # store already off by more than a micro-unit between micro-batches, while
    # the scaled-long state stays exact.  4 single-file micro-batches.
    from decimal import ROUND_HALF_UP, Decimal

    big = 123456789012.345678
    src = str(tmp_path / "stream_src")
    for i in range(4):
        (spark.createDataFrame([(1, big)], "user_id long, value double")
         .coalesce(1).write.mode("append").parquet(src))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    got = ev.run_to_memory(ev.user_running_totals(stream),
                           output_mode="update", shuffle_partitions=2)
    rows = got.filter(F.col("n_events") == 4).collect()
    assert len(rows) == 1, got.collect()
    q6, q4 = Decimal("0.000001"), Decimal("0.0001")
    per_row = Decimal(float(big)).quantize(q6, rounding=ROUND_HALF_UP)
    want = float((4 * per_row).quantize(q4, rounding=ROUND_HALF_UP))
    assert rows[0]["total_value"] == want


def test_quantize_micro_matches_decimal_on_boundaries():
    """The vectorized half-up quantizer must be bit-equal to the scalar
    Decimal(float(v)).quantize(1e-6, HALF_UP) path it replaced — including on
    adversarial .5 boundaries where the v*1e6 double multiply itself rounds."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from alertas_spark.streaming.events import quantize_micro

    q6 = Decimal("0.000001")
    cases = [0.0, -0.0, 0.0000005, -0.0000005, 1.0000005, -1.0000005,
             2.5e-6, 123456789012.345678, -123456789012.345678,
             0.1 + 0.2, 1e-7, 8.0000005, 8.5e-6, 1234.5678915]
    # doubles engineered to sit ULP-close to a .5 micro boundary
    for k in range(200):
        base = (k * 7 + 1) / 2e6  # exact .5 multiples of 1e-6 in binary-ish
        cases += [base, np.nextafter(base, 0), np.nextafter(base, np.inf),
                  -base, np.nextafter(-base, 0), np.nextafter(-base, -np.inf)]
    rng = random.Random(42)
    cases += [rng.uniform(-1e6, 1e6) for _ in range(500)]

    got = quantize_micro(np.array(cases, dtype="float64"))
    for v, g in zip(cases, got):
        want = int(Decimal(float(v)).quantize(q6, rounding=ROUND_HALF_UP).scaleb(6))
        assert g == want, (v, int(g), want)


def test_dedup_within_watermark_suppresses_duplicates(spark, tmp_path):
    """A doubled source (same file linked twice) must dedup back to the
    single-copy distinct count — the bounded-state guarantee the
    dropDuplicatesWithinWatermark query rests on."""
    import os

    from pyspark.sql import functions as F

    from alertas_spark.sources.catalog import normalize_event_ts
    from alertas_spark.streaming import events as ev

    src = "/root/testdata/sf0.001/events.parquet"
    doubled = tmp_path / "doubled"
    doubled.mkdir()
    os.symlink(src, doubled / "a.parquet")
    os.symlink(src, doubled / "b.parquet")

    schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(spark.readStream.schema(schema).parquet(str(doubled)))
    deduped = (stream.withWatermark("ts", "10 minutes")
               .dropDuplicatesWithinWatermark(["event_id"])
               .groupBy("event_type").agg(F.count("*").alias("n_unique")))
    got = {(r.event_type, r.n_unique)
           for r in ev.run_to_memory(deduped, shuffle_partitions=8).collect()}

    want = {(r.event_type, r.n_unique)
            for r in spark.read.parquet(src)
            .groupBy("event_type")
            .agg(F.countDistinct("event_id").alias("n_unique")).collect()}
    assert got == want


def test_clean_corpus_doubled_source_dedups_and_gates(spark, tmp_path):
    """streaming_clean_corpus's dedup must collapse a doubled documents
    source back to the single-copy result, and the output must equal the
    batch gate+dedup+rollup aggregate (the oracle shape) exactly."""
    import os

    from pyspark.sql import functions as F

    from alertas_spark.registry import load_all
    from alertas_spark.streaming import events as ev

    src = "/root/testdata/sf0.001/documents.parquet"
    sf = tmp_path  # a fake sf_dir whose documents table is the doubled source
    doubled = tmp_path / "documents.parquet"
    doubled.mkdir()
    os.symlink(src, doubled / "a.parquet")
    os.symlink(src, doubled / "b.parquet")

    got = {tuple(r) for r in
           load_all()["streaming_clean_corpus"]
           .builder(spark, str(sf)).collect()}

    docs = spark.read.parquet(src)
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    punct = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    want = {tuple(r) for r in
            docs.filter(F.size(toks).between(30, 2000)
                        & (punct / F.greatest(F.length("text"), F.lit(1))
                           < 0.2))
            .select("lang", F.md5(norm).alias("h"),
                    F.size(toks).cast("bigint").alias("n_tok"))
            .dropDuplicates(["lang", "h"])
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"))
            .collect()}
    assert got == want and len(got) > 0


def test_corpus_manifest_doubled_source_dedups_and_enriches(spark, tmp_path):
    """streaming_corpus_manifest (the capstone's streamed front half) must
    collapse a doubled documents source to ONE manifest row per distinct
    (lang, content) and enrich each with the trained-BPE token count of the
    NORMALIZED text — checked cell-for-cell against a driver-side batch
    recomputation using the same artifact-served merges."""
    import hashlib
    import os
    import re

    from pyspark.sql import functions as F

    from alertas_spark.operators.bpe import _apply_merges, _merges_list
    from alertas_spark.registry import load_all

    src = "/root/testdata/sf0.001/documents.parquet"
    sf = tmp_path  # fake sf_dir whose documents table is the doubled source
    doubled = tmp_path / "documents.parquet"
    doubled.mkdir()
    os.symlink(src, doubled / "a.parquet")
    os.symlink(src, doubled / "b.parquet")

    rows = (load_all()["streaming_corpus_manifest"]
            .builder(spark, str(sf)).collect())
    got = {(r["lang"], r["content_hash"], r["n_tokens"]) for r in rows}
    assert len(rows) == len(got), "duplicate manifest rows emitted"

    merges = _merges_list(spark, str(sf))
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    punct = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    kept = (spark.read.parquet(src)
            .filter(F.size(toks).between(30, 2000)
                    & (punct / F.greatest(F.length("text"), F.lit(1)) < 0.2))
            .select("lang", norm.alias("norm")).distinct().collect())
    want = {(r["lang"],
             hashlib.md5(r["norm"].encode()).hexdigest(),
             sum(len(_apply_merges(w, merges))
                 for w in re.findall("[a-z0-9]+", r["norm"])))
            for r in kept}
    assert got == want and len(got) > 0


def test_streaming_lr_gate_replay_equals_batch(spark):
    """Full replay of the streamed LR gate equals the batch tier row-for-row
    (the serving contract: the UDF emits only the exact-integer logit, the
    sigmoid stays JVM-side with the batch expression)."""
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    stream = {tuple(r) for r in
              load_all()["streaming_lr_gate"].builder(spark, sf).collect()}
    batch = {tuple(r) for r in
             load_all()["lr_quality_score"].builder(spark, sf).collect()}
    assert stream == batch
    assert stream  # non-degenerate


def test_streaming_clip_gate_replay_equals_batch(spark):
    """Full replay of the streamed CLIP gate equals the batch tier
    row-for-row (the serving contract: the stream is passed through the
    batch tier's own clip_pairs/gate_projection, so the cosine and the
    keep bit are the batch expressions by construction)."""
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    stream = {tuple(r) for r in
              load_all()["streaming_clip_gate"].builder(spark, sf).collect()}
    batch = {tuple(r) for r in
             load_all()["multimodal_clip_gate"].builder(spark, sf).collect()}
    assert stream == batch
    assert stream  # non-degenerate


def test_streaming_countmin_replay_equals_batch(spark):
    """Full replay of the stream-maintained count-min sketch yields the
    batch heavy-hitter report row-for-row (per-occurrence streamed cell
    counts equal the batch sum-of-token-counts cells; the query side is
    the batch tier's own code)."""
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    stream = {tuple(r) for r in
              load_all()["streaming_countmin_topk"]
              .builder(spark, sf).collect()}
    batch = {tuple(r) for r in
             load_all()["heavyhitters_countmin"]
             .builder(spark, sf).collect()}
    assert stream == batch
    assert stream  # non-degenerate
