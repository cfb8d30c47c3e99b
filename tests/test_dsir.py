"""DSIR importance-resampling semantics (beyond the DuckDB oracle equality).

The oracle pins cross-engine value exactness; these tests pin the selection
SEMANTICS on an adversarial micro-corpus: target-like raw documents must
outscore raw-only documents, target documents never appear in the output, and
the top-k is a rank-consistent subset of the score relation.
"""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _run(spark, name: str, sf: str):
    from alertas_spark.registry import load_all

    return load_all()[name].builder(spark, sf)


def _micro_corpus(tmp_path):
    """Target domain (src0/src1) speaks 'alpha beta gamma'; the raw pool has
    one impostor speaking pure target vocabulary, one half-and-half, and one
    speaking raw-only vocabulary."""
    tgt_text = "alpha beta gamma alpha beta gamma alpha beta"
    rows = []
    for i in range(6):  # target corpus
        rows.append((i, tgt_text, "en", "src0" if i % 2 else "src1"))
    rows.append((100, tgt_text, "en", "src9"))                      # impostor
    rows.append((101, "alpha beta zebra quux zebra quux", "en", "src9"))
    rows.append((102, "zebra quux yonder zebra quux yonder", "en", "src9"))
    for j in range(3):  # bulk raw pool so the raw LM is dominated by raw vocab
        rows.append((200 + j, "zebra quux yonder woble", "en", "src8"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_dsir_target_like_outscores_raw_only(spark, tmp_path):
    sf = _micro_corpus(tmp_path)
    scores = {r.doc_id: r.avg_logratio_nats
              for r in _run(spark, "dsir_logratio_scores", sf).collect()}
    # only the raw pool is scored — no target doc leaks into the output
    assert set(scores) == {100, 101, 102, 200, 201, 202}
    # monotone in target-likeness: pure-target > mixed > raw-only
    assert scores[100] > scores[101] > scores[102]
    # and the sign convention: target-vocabulary docs are net-positive,
    # raw-only docs net-negative (nats/token of evidence)
    assert scores[100] > 0 > scores[102]


def test_dsir_topk_is_rank_consistent_subset(spark, tmp_path):
    sf = _micro_corpus(tmp_path)
    all_scores = {r.doc_id: r.avg_logratio_nats
                  for r in _run(spark, "dsir_logratio_scores", sf).collect()}
    top = sorted(_run(spark, "dsir_select_topk", sf).collect(),
                 key=lambda r: r.sel_rank)
    # K caps the output; the micro pool is smaller than K so all rows rank
    assert [r.sel_rank for r in top] == list(range(1, len(all_scores) + 1))
    # ranks descend by score with doc_id tiebreak — exactly sorted()
    expect = sorted(all_scores, key=lambda d: (-all_scores[d], d))
    assert [r.doc_id for r in top] == expect
    # the impostor wins selection
    assert top[0].doc_id == 100


def test_dsir_gumbel_is_a_reshard_stable_resample(spark):
    """The Gumbel draw must be (a) a sample — not score order — and (b) the
    SAME sample on every run (hash-seeded, no RNG state)."""
    from alertas_spark.operators.dsir import DSIR_K, TARGET_SOURCES

    a = sorted((r.doc_id, r.sel_rank) for r in
               _run(spark, "dsir_sample_gumbel", SF).collect())
    b = sorted((r.doc_id, r.sel_rank) for r in
               _run(spark, "dsir_sample_gumbel", SF).collect())
    assert a == b, "resample must be deterministic across runs"
    rows = _run(spark, "dsir_sample_gumbel", SF).collect()
    assert len(rows) <= DSIR_K
    assert all(r.source not in TARGET_SOURCES for r in rows)
    # noise actually reorders: the Gumbel ranking must differ from the
    # deterministic score ranking somewhere (astronomically unlikely to
    # coincide unless the noise silently vanished)
    det = [r.doc_id for r in sorted(_run(spark, "dsir_select_topk", SF)
                                    .collect(), key=lambda r: r.sel_rank)]
    gum = [r.doc_id for r in sorted(rows, key=lambda r: r.sel_rank)]
    assert det != gum


def test_pipeline_dsir_curated_composes_its_stages(spark):
    """The capstone's rows are exactly (top-K selection) − (bloom-flagged),
    re-ranked densely with packs cut along the curated order."""
    from alertas_spark.operators.packing import PACK_BUDGET

    top = {r.doc_id for r in _run(spark, "dsir_select_topk", SF).collect()}
    flagged = {r.doc_id for r in
               _run(spark, "decontaminate_bloom", SF).collect()}
    out = sorted(_run(spark, "pipeline_dsir_curated", SF).collect(),
                 key=lambda r: r.cur_rank)
    assert {r.doc_id for r in out} == top - flagged
    assert [r.cur_rank for r in out] == list(range(1, len(out) + 1))
    cum = 0
    for r in out:
        assert r.pack_id == cum // PACK_BUDGET
        cum += r.n_tokens


def test_dsir_topk_caps_at_k_on_real_data(spark):
    from alertas_spark.operators.dsir import DSIR_K, TARGET_SOURCES

    rows = _run(spark, "dsir_select_topk", SF).collect()
    assert len(rows) <= DSIR_K
    assert all(r.source not in TARGET_SOURCES for r in rows)
    assert all(1 <= r.sel_rank <= DSIR_K for r in rows)
