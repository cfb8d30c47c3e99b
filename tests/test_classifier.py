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
