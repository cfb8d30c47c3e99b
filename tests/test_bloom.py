"""Bloom decontamination invariants (beyond the DuckDB oracle equality)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _run(spark, name: str, sf: str = SF):
    from alertas_spark.registry import load_all

    return load_all()[name].builder(spark, sf)


def test_bloom_never_misses_exact_overlap(spark):
    """No false negatives: every document the exact tier flags, the bloom
    tier flags with at least as many grams."""
    exact = {r.doc_id: r.n_shared_ngrams
             for r in _run(spark, "decontaminate_overlap").collect()}
    bloom = {r.doc_id: r.n_flagged_grams
             for r in _run(spark, "decontaminate_bloom").collect()}
    assert exact, "fixture must have real contamination for the test to bite"
    assert set(exact) <= set(bloom)
    assert all(bloom[d] >= exact[d] for d in exact)


def test_bloom_audit_identity_at_shipped_geometry(spark):
    row = _run(spark, "bloom_fp_audit").collect()[0]
    assert row.n_flagged == row.n_exact + row.n_false_pos
    assert row.n_exact > 0


def test_bloom_tiny_m_forces_false_positives(spark, monkeypatch):
    """Drive m down so probe positions collide: the filter must stay superset
    (identity holds) while producing real false positives — the mechanics the
    shipped geometry makes invisible."""
    from alertas_spark.operators import bloom

    monkeypatch.setattr(bloom, "BLOOM_M", 8)
    row = bloom.bloom_fp_audit(spark, SF).collect()[0]
    assert row.n_flagged == row.n_exact + row.n_false_pos
    assert row.n_false_pos > 0
