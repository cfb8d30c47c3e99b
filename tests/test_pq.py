"""Product-quantization properties the DuckDB oracle can't see.

The oracle pins exact cross-engine equality of codes/distances; these tests pin
the *semantics*: seeds must be fixed points of the encoder, ADC ranking must be
internally consistent, and the compressed ranking must genuinely approximate the
exact (brute-force cosine) ranking.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_seed_vectors_are_encoder_fixed_points(spark):
    # a seed vector's nearest codeword in every subspace is itself → codes are
    # its own vec_id and the quantization error is exactly zero
    from alertas_spark.operators.pq import KSUB, pq_encode

    rows = pq_encode(spark, SF).filter(f"vec_id < {KSUB}").collect()
    assert len(rows) == KSUB
    for r in rows:
        assert (r.code_1, r.code_2, r.code_3, r.code_4) == (r.vec_id,) * 4
        assert r.qerr == 0.0


def test_codes_in_range_and_qerr_nonnegative(spark):
    from alertas_spark.operators.pq import KSUB, pq_encode

    for r in pq_encode(spark, SF).collect():
        assert all(0 <= c < KSUB for c in (r.code_1, r.code_2, r.code_3, r.code_4))
        assert r.qerr >= 0.0


def test_adc_scores_sorted_within_query(spark):
    from alertas_spark.operators.pq import TOP_K, simsearch_topk_pq

    by_query = {}
    for r in simsearch_topk_pq(spark, SF).collect():
        by_query.setdefault(r.query_id, []).append((r.rnk, r.score, r.cand_id))
    for ranked in by_query.values():
        ranked.sort()
        assert [r for r, _, _ in ranked] == list(range(1, TOP_K + 1))
        scores = [s for _, s, _ in ranked]
        assert scores == sorted(scores)  # ascending L2² distance


def test_pq_recall_floor_vs_bruteforce(spark):
    # compressed-domain ranking must approximate the exact cosine ranking;
    # measured 0.20 at sf0.001 with the train-free codebook — pin a floor so a
    # codebook/normalization regression can't silently zero the recall
    from alertas_spark.operators.pq import simsearch_topk_pq
    from alertas_spark.operators.simsearch import simsearch_topk_bruteforce

    pq = {(r.query_id, r.cand_id) for r in simsearch_topk_pq(spark, SF).collect()}
    bf = {(r.query_id, r.cand_id)
          for r in simsearch_topk_bruteforce(spark, SF).collect()}
    assert len(pq & bf) / len(bf) >= 0.15


def test_rerank_improves_recall_and_scores_exactly(spark):
    # the exact re-rank must (a) beat raw ADC recall, (b) agree with the
    # brute-force cosine wherever the same (query, cand) pair appears
    from alertas_spark.operators.pq import (simsearch_topk_pq,
                                            simsearch_topk_pq_reranked)
    from alertas_spark.operators.simsearch import simsearch_topk_bruteforce

    bf = {(r.query_id, r.cand_id): r.score
          for r in simsearch_topk_bruteforce(spark, SF).collect()}
    adc = {(r.query_id, r.cand_id) for r in simsearch_topk_pq(spark, SF).collect()}
    rr = {(r.query_id, r.cand_id): r.score
          for r in simsearch_topk_pq_reranked(spark, SF).collect()}
    assert len(rr.keys() & bf.keys()) > len(adc & bf.keys())
    for pair, score in rr.items():
        if pair in bf:
            assert score == bf[pair]  # identical exact cosine, identical rounding


def test_trained_codebook_reduces_quantization_error(spark):
    # one Lloyd update (assign -> mean -> re-assign) cannot increase the total
    # quantization error vs the seed codebook (means minimize within-cell error,
    # re-assignment minimizes per-vector error); allow 1e-4 slack for the
    # DECIMAL(29,6) mean rounding and the 1e-9 qerr quantization
    from alertas_spark.operators.pq import KSUB, pq_encode, pq_encode_trained

    untrained = sum(r.qerr for r in pq_encode(spark, SF).collect())
    rows = pq_encode_trained(spark, SF).collect()
    trained = sum(r.qerr for r in rows)
    assert trained <= untrained + 1e-4
    for r in rows:
        assert all(0 <= c < KSUB for c in (r.code_1, r.code_2, r.code_3, r.code_4))
        assert r.qerr >= 0.0


def test_int8_quantization_error_is_bounded_by_half_a_step(spark):
    """Affine round-to-nearest guarantees |x - recon| <= scale_i/2 per dim, so
    every vector's max_abs_err is bounded by half the WIDEST dimension step."""
    from pyspark.sql import functions as F

    from alertas_spark.registry import load_all
    from alertas_spark.sources.catalog import load_table

    SF = "/root/testdata/sf0.001"
    out = load_all()["embedding_quantize_int8"].builder(spark, SF)
    v = load_table(spark, SF, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x"))
    from alertas_spark.operators.pq import DIM
    widest = v.agg(F.max(F.expr(
        "array_max(x)")) - F.min(F.expr("array_min(x)"))).collect()[0][0]
    half_step = widest / 255.0 / 2.0
    assert out.filter(F.col("max_abs_err") > half_step + 1e-9).count() == 0
    assert out.count() > 0


def _adversarial(spark, build):
    """Run ``build()`` twice: default layout, then adversarial scan splits +
    prime shuffle width + tiny Arrow batches (forces the numpy mapInPandas
    shortlist through many small batches).  Results must be cell-identical."""
    from alertas_spark.operators import memo

    memo.clear()
    base = sorted(map(tuple, build().collect()))
    confs = {"spark.sql.files.maxPartitionBytes": str(64 * 1024),
             "spark.sql.shuffle.partitions": "13",
             "spark.sql.execution.arrow.maxRecordsPerBatch": "64"}
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        memo.clear()
        alt = sorted(map(tuple, build().collect()))
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return base, alt


def test_pq_topk_invariant_under_adversarial_partitioning(spark):
    """The PQ tier's inline per-partition ADC shortlist (pq.py _adc_topk) must
    contain the global top-k for ANY input layout — pinned by re-running the
    whole declared query under adversarial partitioning."""
    from alertas_spark.operators.pq import simsearch_topk_pq

    base, alt = _adversarial(spark, lambda: simsearch_topk_pq(spark, SF))
    assert base == alt and len(base) > 0


def test_bruteforce_topk_invariant_under_adversarial_partitioning(spark):
    """Same pin for the brute-force tier's ranked_topk (operators/topk.py)."""
    from alertas_spark.operators.simsearch import simsearch_topk_bruteforce

    base, alt = _adversarial(spark, lambda: simsearch_topk_bruteforce(spark, SF))
    assert base == alt and len(base) > 0


# ---------------------------------------------------------------------------
# IVFADC residual tier (lives in operators/pq.py — see the import-order note)
# ---------------------------------------------------------------------------


def test_ivfpq_standalone_pq_import_registers_the_residual_tier():
    """A standalone `import pq` in a fresh interpreter must register the
    residual tier (it lives in pq.py above the dashboard, so the dashboard
    oracle can reference it without any import-order hazard)."""
    import subprocess
    import sys

    code = ("import alertas_spark.operators.pq; "
            "from alertas_spark.registry import REGISTRY; "
            "assert 'simsearch_topk_ivfpq_residual' in REGISTRY")
    subprocess.run([sys.executable, "-c", code], check=True,
                   cwd="/root/repo", timeout=120)


def test_ivfpq_recall_floor_and_probe_containment(spark):
    """The residual tier must (a) hold a recall floor vs brute force (0.30
    measured at sf0.001/sf0.01 fixtures; 0.22 vs flat-PQ's 0.14 at sf0.1),
    and (b) only surface candidates from the query's NPROBE probed cells —
    the IVF prune contract."""
    from alertas_spark.operators.pq import (NPROBE,
                                            simsearch_topk_ivfpq_residual)
    from alertas_spark.operators.kmeans import _assign
    from alertas_spark.operators.pq import _normalized
    from alertas_spark.operators.pq import _coarse_centroids
    from alertas_spark.operators.simsearch import simsearch_topk_bruteforce
    from pyspark.sql import functions as F

    out = simsearch_topk_ivfpq_residual(spark, SF).collect()
    bf = {(r.query_id, r.cand_id)
          for r in simsearch_topk_bruteforce(spark, SF).collect()}
    got = {(r.query_id, r.cand_id) for r in out}
    assert len(got & bf) / len(bf) >= 0.15
    # probe containment: every candidate's cell is among its query's probes
    # (_coarse_centroids returns the driver-held ROWS; rebuild a relation
    # for this test's independent crossJoin re-derivation)
    c1_rows = _coarse_centroids(spark, SF)
    c1 = spark.createDataFrame(c1_rows)
    cells = {r.vec_id: r.cid
             for r in _assign(_normalized(spark, SF), c1_rows).collect()}
    qdist = ("aggregate(zip_with(qemb, cvec, (x, y) -> (x - y) * (x - y)), "
             "cast(0.0 as double), (acc, v) -> acc + v)")
    probes: dict[int, list] = {}
    for r in (_normalized(spark, SF)
              .filter(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("emb").alias("qemb"))
              .crossJoin(F.broadcast(c1))
              .withColumn("qd", F.expr(qdist)).collect()):
        probes.setdefault(r.query_id, []).append((r.qd, r.cid))
    for q, cand in got:
        top = {cid for _, cid in sorted(probes[q])[:NPROBE]}
        assert cells[cand] in top


def test_ivfpq_rerank_beats_adc_and_scores_exactly(spark):
    """IVFADC+R must (a) beat the raw residual-ADC recall, (b) agree with
    the brute-force cosine wherever the same (query, cand) pair appears —
    the simsearch_topk_pq_reranked contract over the IVF-pruned shortlist."""
    from alertas_spark.operators.pq import (simsearch_topk_ivfpq_rerank,
                                            simsearch_topk_ivfpq_residual)
    from alertas_spark.operators.simsearch import simsearch_topk_bruteforce

    bf = {(r.query_id, r.cand_id): r.score
          for r in simsearch_topk_bruteforce(spark, SF).collect()}
    adc = {(r.query_id, r.cand_id)
           for r in simsearch_topk_ivfpq_residual(spark, SF).collect()}
    rr = {(r.query_id, r.cand_id): r.score
          for r in simsearch_topk_ivfpq_rerank(spark, SF).collect()}
    assert len(rr.keys() & bf.keys()) > len(adc & bf.keys())
    for pair, score in rr.items():
        if pair in bf:
            assert score == bf[pair]


def test_single_exchange_sub_mean_equals_exploded_form(spark):
    """r18: the residual/PQ codebook Lloyd mean runs as ONE groupBy with
    SUBDIM per-dimension decimal sum columns (pq._sub_mean).  Pin
    bit-equality against the former posexplode + per-(m, c, dim) aggregate
    on values that exercise decimal accumulation (0.1-style doubles whose
    naive double-sum order matters)."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.pq import SUBDIM, _sub_mean

    vals = [[(0.1 * (i + 1) + 0.7 * r) % 1.3 for i in range(SUBDIM)]
            for r in range(9)]
    subs = spark.createDataFrame(
        [(r, 1 + r % 4, r % 3, vals[r]) for r in range(9)],
        "vec_id bigint, m int, c int, sub array<double>")
    got_s = {(r.m, r.c): r.cvec for r in _sub_mean(subs).collect()}
    # reference: the exploded two-level form this rewrite replaced
    ref_s_rows = (
        subs.select("m", "c", F.posexplode("sub").alias("pos", "x"))
        .groupBy("m", "c", "pos")
        .agg((F.sum(F.col("x").cast("decimal(29,6)")).cast("double")
              / F.count("*")).alias("mu"))
        .collect())
    ref_s: dict[tuple, dict[int, float]] = {}
    for r in ref_s_rows:
        ref_s.setdefault((r.m, r.c), {})[r.pos] = r.mu
    assert set(got_s) == set(ref_s)
    for key, cvec in got_s.items():
        assert cvec == [ref_s[key][p] for p in range(SUBDIM)]
