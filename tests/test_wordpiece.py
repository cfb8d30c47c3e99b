"""WordPiece semantic pins (beyond oracle equality): likelihood-vs-frequency
merge selection, greedy longest-match properties, and the horizon fallback."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_wp_score_beats_frequency_on_crafted_vocab():
    """The defining WordPiece property: a rare-but-EXCLUSIVE pair outranks a
    frequent-but-independent one.  'xq' appears 5× and both 'x' and 'q'
    occur ONLY in it (score 5/(5·5) = 0.2); 'ab' appears 20× but 'a'/'b'
    are everywhere (score 20/(60·60) ≈ 0.0056).  BPE would merge the most
    frequent pair; WordPiece must merge (x, ##q) first."""
    from alertas_spark.operators.bpe import _train_merges_py
    from alertas_spark.operators.wordpiece import _train_wp_py

    words = [("ab", 20), ("aa", 20), ("bb", 20), ("xq", 5)]
    wp = _train_wp_py(words, n_merges=1)
    assert (wp[0][1], wp[0][2]) == ("x", "##q") and wp[0][3] == "xq"
    bpe = _train_merges_py(words, n_merges=1)
    assert (bpe[0][1], bpe[0][2]) != ("x", "q")


def test_wp_greedy_longest_match_hand_computed():
    """Greedy maximal munch with continuation forms, stepped by hand:
    plain = chars + {'he'}, continuation (stripped texts) = chars + {'llo'}.
    'hello' → he|##llo = 2 tokens.
    'hhello' → h|##h|##e|##llo = 4 tokens (the initial-form 'he' piece must
    NOT match at a continuation position)."""
    from alertas_spark.operators.wordpiece import _wp_ntok

    plain = set("helo") | {"he"}
    cont = set("helo") | {"llo"}
    assert _wp_ntok("hello", plain, cont, 3) == 2
    assert _wp_ntok("hhello", plain, cont, 3) == 4


def test_wp_horizon_fallback_and_bounds(spark):
    """Every word ≤ WP_LMAX tokenizes to between 1 and len(word) pieces;
    words beyond the horizon count exactly len(word) (char fallback) — the
    oracle contract."""
    from alertas_spark.operators.bpe import _doc_words
    from alertas_spark.operators.wordpiece import (WP_LMAX, _wp_ntok,
                                                   _wp_vocab_sets)

    plain, cont, maxlen = _wp_vocab_sets(spark, SF)
    words = [r["word"] for r in
             _doc_words(spark, SF).select("word").distinct().collect()]
    assert words
    for w in words:
        n = _wp_ntok(w, plain, cont, maxlen)
        assert 1 <= n <= len(w)
    long_word = "a" * (WP_LMAX + 3)
    assert _wp_ntok(long_word, plain, cont, maxlen) == WP_LMAX + 3


def test_wp_trained_vocab_reduces_tokens_vs_chars(spark):
    """The trained pieces must compress: total WordPiece tokens strictly
    below total characters of the tokenized words (the alphabet-only count),
    since at least one multi-char piece trains on every fixture."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.bpe import _doc_words
    from alertas_spark.registry import load_all

    out = load_all()["wordpiece_token_count"].builder(spark, SF)
    chars = (_doc_words(spark, SF)
             .agg(F.sum(F.length("word"))).collect()[0][0])
    toks = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert 0 < toks < chars
