"""Naive-Bayes classifier semantics (beyond the DuckDB oracle equality)."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _run(spark, name: str, sf: str):
    from alertas_spark.registry import load_all

    return load_all()[name].builder(spark, sf)


def _labeled_corpus(tmp_path):
    """Two classes with disjoint vocabularies.  doc_ids are laid out so every
    class appears in BOTH the train folds (id % 5 != 0) and the test fold
    (id % 5 == 0): ids 0..9 speak 'en', ids 10..19 speak 'fr'."""
    rows = []
    for i in range(10):
        rows.append((i, "apple orange grape apple orange", "en", "srcA"))
    for i in range(10, 20):
        rows.append((i, "pomme raisin poire pomme raisin", "fr", "srcA"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_nb_classifies_disjoint_vocab_perfectly(spark, tmp_path):
    from alertas_spark.operators.classifier import NB_FOLDS

    sf = _labeled_corpus(tmp_path)
    rows = _run(spark, "nb_lang_classify", sf).collect()
    # exactly the held-out fold is scored
    assert {r.doc_id for r in rows} == {0, 5, 10, 15}
    assert all(r.doc_id % NB_FOLDS == 0 for r in rows)
    # disjoint vocabulary → every prediction correct
    assert all(r.pred_lang == r.lang and r.hit == 1 for r in rows)


def test_nb_unseen_vocab_falls_back_to_prior(spark, tmp_path):
    """A test doc whose words the model never saw gets the majority-prior
    class (all per-class likelihoods tie at the smoothing floor... they do
    NOT tie: the class with the smaller denominator Q(Nc+B) wins each unseen
    term, and the prior breaks further ties) — the point pinned here is that
    it gets *a* deterministic prediction, not a crash or a dropped row."""
    rows = [(i, "apple orange grape", "en", "srcA") for i in range(1, 10)]
    rows += [(i, "pomme raisin poire", "fr", "srcA") for i in range(11, 20)]
    rows.append((0, "zzz qqq yyy", "de", "srcA"))  # unseen vocab, test fold
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")

    out = {r.doc_id: r for r in _run(spark, "nb_lang_classify",
                                     str(tmp_path)).collect()}
    assert 0 in out
    assert out[0].pred_lang in {"en", "fr"}  # a trained class, never 'de'
    assert out[0].hit == 0


def test_nb_null_lang_is_unlabeled_not_a_class(spark, tmp_path):
    """A NULL-lang training doc must not create a phantom class; a NULL-lang
    test doc is still scored — against real classes only."""
    import pandas as pd

    rows = [(i, "apple orange grape", "en", "s") for i in range(1, 10)]
    rows += [(i, "pomme raisin poire", "fr", "s") for i in range(11, 20)]
    rows.append((21, "apple orange grape", None, "s"))  # NULL-lang TRAIN doc
    rows.append((0, "apple orange grape", None, "s"))   # NULL-lang TEST doc
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")

    out = {r.doc_id: r for r in _run(spark, "nb_lang_classify",
                                     str(tmp_path)).collect()}
    assert 0 in out
    assert out[0].pred_lang == "en"  # scored against real classes only
    assert out[0].hit == 0           # NULL true label never counts as a hit
    assert all(r.pred_lang is not None for r in out.values())


def test_nb_confusion_totals_match_predictions(spark):
    pred = _run(spark, "nb_lang_classify", SF).collect()
    conf = _run(spark, "nb_classifier_confusion", SF).collect()
    assert sum(r.n for r in conf) == len(pred)
    diag = {(r.lang, r.pred_lang): r.n for r in conf}
    hits = sum(n for (t, p), n in diag.items() if t == p)
    assert hits == sum(r.hit for r in pred)


# ---------------------------------------------------------------------------
# IRLS logistic regression (operators/logreg.py)
# ---------------------------------------------------------------------------


def _separable_corpus(tmp_path):
    """Curated docs (source='src0' ∈ TARGET_SOURCES) speak only bucket-0
    words under the 'lrb:' hash salt; crawl docs (source='web') only
    bucket-1 words.  Lengths alternate 5/3 so the design matrix
    [1, x1, x2] is full rank.  ids 0..9 curated, 10..19 crawl — both
    classes land in train (id % 5 != 0) AND test (id % 5 == 0) folds."""
    b0 = "alpha golf hotel jazz mike"      # all hash to bucket 0
    b1 = "beta gamma delta echo fox"       # all hash to bucket 1
    rows = []
    for i in range(10):
        t = b0 if i % 2 == 0 else " ".join(b0.split()[:3])
        rows.append((i, t, "en", "src0"))
    for i in range(10, 20):
        t = b1 if i % 2 == 0 else " ".join(b1.split()[:3])
        rows.append((i, t, "en", "web"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_lr_learns_a_separable_gate(spark, tmp_path):
    """On a linearly separable corpus four Newton iterations drive the
    held-out probabilities to the correct side with margin — the model
    genuinely LEARNS, it does not just reproduce the base rate."""
    sf = _separable_corpus(tmp_path)
    out = {r.doc_id: r for r in _run(spark, "lr_quality_score", sf).collect()}
    assert set(out) == {0, 5, 10, 15}
    for d in (0, 5):          # curated docs
        assert out[d].y == 1 and out[d].pred == 1 and out[d].hit == 1
        assert out[d].prob > 0.9, (d, out[d].prob)
    for d in (10, 15):        # crawl docs
        assert out[d].y == 0 and out[d].pred == 0 and out[d].hit == 1
        assert out[d].prob < 0.1, (d, out[d].prob)


def test_lr_gate_keeps_above_prior_and_is_deterministic(spark, tmp_path):
    """The gate keeps exactly the held-out docs with mu >= training prior,
    and a retrained run (memo cleared) reproduces the same selection."""
    from alertas_spark.operators import memo

    sf = _separable_corpus(tmp_path)
    kept = {(r.doc_id, r.prob) for r in _run(spark, "lr_gate_select",
                                             sf).collect()}
    assert {d for d, _ in kept} == {0, 5}  # prior = 0.5; curated side only
    memo.clear()
    again = {(r.doc_id, r.prob) for r in _run(spark, "lr_gate_select",
                                              sf).collect()}
    assert kept == again


def test_lr_nb_audit_cells_partition_the_fold(spark):
    """The audit's cell counts partition the shared held-out fold, and
    nb_hits per cell never exceeds the cell count."""
    pred = _run(spark, "lr_quality_score", SF).collect()
    audit = _run(spark, "lr_nb_confusion_audit", SF).collect()
    assert sum(r.n for r in audit) == len(pred)
    for r in audit:
        assert 0 <= r.nb_hits <= r.n


def test_lr_null_source_is_crawl(spark, tmp_path):
    """A NULL source is the crawl class (y = 0), never dropped and never a
    phantom positive — the DSIR NULL convention."""
    rows = [(i, "alpha golf hotel", "en", "src0") for i in range(1, 8)]
    rows += [(i, "beta gamma delta", "en", None) for i in range(11, 18)]
    rows.append((0, "alpha golf hotel", "en", None))   # NULL-source TEST doc
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    out = {r.doc_id: r for r in _run(spark, "lr_quality_score",
                                     str(tmp_path)).collect()}
    assert 0 in out and out[0].y == 0
