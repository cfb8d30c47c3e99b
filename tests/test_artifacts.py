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


def test_incomplete_artifact_debris_is_rebuilt(spark, tmp_path):
    """A crashed pre-atomic writer's leftovers (part files, no _SUCCESS) must
    not be served: exists() is _SUCCESS-gated, and load_or_build replaces the
    debris with a complete atomically-renamed build."""
    from alertas_spark.operators import artifacts

    wh = str(tmp_path)
    debris = artifacts.artifact_path(wh, "kmeans_centroids", "v1")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00not parquet")  # truncated part file, no _SUCCESS
    assert not artifacts.exists(spark, wh, "kmeans_centroids", "v1")

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _train_centroids(spark)

    got = artifacts.load_or_build(spark, wh, "kmeans_centroids", "v1", build)
    assert calls["n"] == 1
    assert got.count() > 0
    assert artifacts.exists(spark, wh, "kmeans_centroids", "v1")
    # debris gone, no temp dirs left behind
    parent = os.path.dirname(debris)
    assert os.listdir(parent) == ["v=v1"]


def test_fingerprint_tracks_dataset_rewrites(tmp_path):
    """Same bytes rewritten (mtime bump) or different bytes → new version key;
    an untouched file → stable key."""
    from alertas_spark.operators import artifacts

    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"AAAA")
    f1 = artifacts.dataset_fingerprint(str(tmp_path), "embeddings")
    assert artifacts.dataset_fingerprint(str(tmp_path), "embeddings") == f1
    os.utime(p, ns=(1, 1))
    f2 = artifacts.dataset_fingerprint(str(tmp_path), "embeddings")
    assert f2 != f1


def test_fingerprint_tracks_directory_table_part_rewrites(tmp_path):
    """Directory-layout tables (<table>.parquet/ of part files) fingerprint by
    their PART files: an in-place same-name part rewrite leaves the directory
    inode's size/mtime unchanged, so stat'ing the dir (the old fallback) would
    serve a stale artifact."""
    from alertas_spark.operators import artifacts

    d = tmp_path / "embeddings.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    part.write_bytes(b"AAAA")
    (d / "_SUCCESS").write_bytes(b"")
    f1 = artifacts.dataset_fingerprint(str(tmp_path), "embeddings")
    assert artifacts.dataset_fingerprint(str(tmp_path), "embeddings") == f1
    # in-place rewrite: same file name, same byte count, new mtime — the dir
    # stat is unchanged but the dataset is not the same snapshot
    os.utime(part, ns=(1, 1))
    f2 = artifacts.dataset_fingerprint(str(tmp_path), "embeddings")
    assert f2 != f1
    # and a new part file changes it again
    (d / "part-00001.parquet").write_bytes(b"BBBB")
    assert artifacts.dataset_fingerprint(str(tmp_path), "embeddings") != f2


def test_persistent_queries_registry_is_accurate(spark, tmp_path):
    """artifacts.PERSISTENT_QUERIES (the set bench.py's persistent tier
    iterates) is accurate: every listed query persists into a configured
    store on first run and answers from it (zero builder calls) on a
    memo-cold second run."""
    from alertas_spark.operators import artifacts, memo
    from alertas_spark.registry import load_all

    reg = load_all()
    assert artifacts.PERSISTENT_QUERIES <= set(reg)
    try:
        for name in sorted(artifacts.PERSISTENT_QUERIES):
            spark.conf.set(artifacts.CONF_KEY, str(tmp_path / name))
            memo.clear()
            b0 = artifacts.build_count()
            reg[name].builder(spark, SF).write.format("noop") \
                .mode("overwrite").save()
            assert artifacts.build_count() > b0, f"{name} persisted nothing"
            memo.clear()  # simulated new session: memo cold, store warm
            b1 = artifacts.build_count()
            reg[name].builder(spark, SF).write.format("noop") \
                .mode("overwrite").save()
            assert artifacts.build_count() == b1, f"{name} retrained"
    finally:
        spark.conf.unset(artifacts.CONF_KEY)
        memo.clear()


def test_two_separate_sessions_second_skips_training(tmp_path):
    """THE cross-session claim, proven end to end: two separate OS processes
    (separate Spark JVMs), a shared $ALERTAS_ARTIFACTS_DIR.  The first session
    trains (build_calls == 2: IVF assignment + PQ codebook) and persists; the
    second answers both trained queries with ZERO builder invocations,
    identical rows, and — for the fully-artifact-derived IVF query — a plan
    whose only file source is _artifacts/ (no embeddings.parquet scan)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, ALERTAS_ARTIFACTS_DIR=str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(phase):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "tests", "_artifact_session.py"),
             phase],
            env=env, cwd=repo, capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr[-3000:]
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        return json.loads(line.removeprefix("RESULT "))

    first = run("first")
    assert first["build_calls"] == 2
    assert any("_artifacts" in s for s in os.listdir(str(tmp_path)))

    second = run("second")
    assert second["build_calls"] == 0, "second session retrained"
    assert second["rows"] == first["rows"]
    assert any("_artifacts" in s for s in second["ivf_plan_sources"])
    assert not any("embeddings.parquet" in s
                   for s in second["ivf_plan_sources"])


def test_lm_tables_roundtrip_identical_scores(spark, tmp_path):
    """The r14 LM persistence pin: for both perplexity queries, the scores
    computed memo-only, on the store-building first run, and on a
    memo-cold store-warm run are cell-identical — persisting the count
    tables changes WHERE the LM lives, never what it says."""
    from alertas_spark.operators import artifacts, memo
    from alertas_spark.registry import load_all

    reg = load_all()
    for name in ("perplexity_unigram", "perplexity_bigram_backoff"):
        memo.clear()
        base = sorted(map(tuple, reg[name].builder(spark, SF).collect()))
        spark.conf.set(artifacts.CONF_KEY, str(tmp_path / name))
        try:
            memo.clear()
            first = sorted(map(tuple,
                               reg[name].builder(spark, SF).collect()))
            memo.clear()  # simulated new session: memo cold, store warm
            warm = sorted(map(tuple,
                              reg[name].builder(spark, SF).collect()))
        finally:
            spark.conf.unset(artifacts.CONF_KEY)
            memo.clear()
        assert base == first == warm and len(base) > 0, name


def test_overlap_concurrent_builds_memoize_once(spark):
    """memo.overlap materializes independent artifacts concurrently, and the
    per-key lock makes concurrent same-key consumers build exactly once —
    the invariant the panel/dashboard §2.6 overlap rests on."""
    import threading

    from alertas_spark.operators import memo

    memo.clear()
    builds = {"a": 0, "b": 0}
    lock = threading.Lock()

    def make(key):
        def build():
            with lock:
                builds[key] += 1
            return spark.range(5).selectExpr(
                "id", f"'{key}' as k").localCheckpoint()
        return build

    # two distinct keys, each requested by TWO concurrent thunks
    thunks = [
        (lambda k=k: memo.session_artifact(spark, ("ovl_test", k), make(k)))
        for k in ("a", "b", "a", "b")
    ]
    results = memo.overlap(thunks, max_workers=4)
    assert builds == {"a": 1, "b": 1}  # same-key races serialized, built once
    # both consumers of a key got the SAME memoized relation
    assert results[0] is results[2] and results[1] is results[3]
    assert sorted(r.first()["k"] for r in results) == ["a", "a", "b", "b"]
    # exceptions propagate all-or-nothing
    def boom():
        raise RuntimeError("axis failed")
    try:
        memo.overlap([boom, lambda: results[0]], max_workers=2)
        raise AssertionError("expected the thunk's exception to propagate")
    except RuntimeError as ex:
        assert "axis failed" in str(ex)
    memo.clear()
