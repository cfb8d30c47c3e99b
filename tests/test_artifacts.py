"""Persistent trained-artifact store (operators/artifacts.py): train once,
reuse across sessions, invalidate by version — pinned end-to-end with the real
k-means trainer."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _train_centroids(spark):
    """The real Lloyd-iteration centroid trainer from kmeans.py (K rows)."""
    from alertas_spark.operators.kmeans import K, _assign, _update
    from alertas_spark.operators.embgate import valid_embeddings
    from alertas_spark.sources.catalog import load_table

    v = valid_embeddings(load_table(spark, SF, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    c0 = v.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
    return _update(_assign(v, c0)).localCheckpoint()


def test_train_once_then_load(spark, tmp_path):
    from alertas_spark.operators import artifacts

    wh = str(tmp_path)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _train_centroids(spark)

    a1 = artifacts.load_or_build(spark, wh, "kmeans_centroids", "v1", build)
    rows1 = sorted((r.cid, tuple(round(x, 9) for x in r.cvec))
                   for r in a1.collect())
    assert calls["n"] == 1
    assert artifacts.exists(spark, wh, "kmeans_centroids", "v1")

    # second consumer: loads from parquet, builder NOT re-run, rows identical
    a2 = artifacts.load_or_build(spark, wh, "kmeans_centroids", "v1", build)
    rows2 = sorted((r.cid, tuple(round(x, 9) for x in r.cvec))
                   for r in a2.collect())
    assert calls["n"] == 1
    assert rows1 == rows2


def test_version_bump_retrains(spark, tmp_path):
    from alertas_spark.operators import artifacts

    wh = str(tmp_path)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _train_centroids(spark)

    artifacts.load_or_build(spark, wh, "kmeans_centroids", "v1", build)
    artifacts.load_or_build(spark, wh, "kmeans_centroids", "v2", build)
    assert calls["n"] == 2
    assert artifacts.versions(wh, "kmeans_centroids") == ["v1", "v2"]


def test_artifact_survives_disk_roundtrip_exactly(spark, tmp_path):
    """The on-disk artifact is value-identical to the in-memory training
    result — parquet round-trips bigint ids and double vectors exactly, so a
    tomorrow-session consumer sees bit-equal centroids."""
    from alertas_spark.operators import artifacts

    wh = str(tmp_path)
    trained = _train_centroids(spark)
    got = artifacts.load_or_build(spark, wh, "kmeans_centroids", "v1",
                                  lambda: trained)
    a = sorted((r.cid, tuple(r.cvec)) for r in trained.collect())
    b = sorted((r.cid, tuple(r.cvec)) for r in got.collect())
    assert a == b  # exact doubles, no tolerance
