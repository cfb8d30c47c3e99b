"""curriculum_pack invariants (beyond the DuckDB oracle equality)."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _rows(spark):
    from alertas_spark.registry import load_all

    return load_all()["curriculum_pack"].builder(spark, SF).collect()


def test_curriculum_rank_is_easy_to_hard_per_shard(spark):
    by_src = defaultdict(list)
    for r in _rows(spark):
        by_src[r.source].append(r)
    assert by_src
    for rows in by_src.values():
        rows.sort(key=lambda r: r.cur_rank)
        assert [r.cur_rank for r in rows] == list(range(1, len(rows) + 1))
        ces = [(r.cross_entropy_nats, r.doc_id) for r in rows]
        assert ces == sorted(ces), "curriculum must be ordered by difficulty"


def test_curriculum_packs_cut_at_budget_along_the_order(spark):
    from alertas_spark.operators.packing import PACK_BUDGET

    by_src = defaultdict(list)
    for r in _rows(spark):
        by_src[r.source].append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.cur_rank)
        cum = 0
        for r in rows:
            assert r.pack_id == cum // PACK_BUDGET
            cum += r.n_tokens
        # pack_id is nondecreasing along the curriculum by construction
        pids = [r.pack_id for r in rows]
        assert pids == sorted(pids)
