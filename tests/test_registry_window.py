"""Guard the driver's 50-query correctness-window scheduler.

The driver harness oracle-checks the FIRST 50 registry entries; the registry
orders queries from the driver's own CORRECTNESS_r*.json history — red-at-last-
check first, code-touched-since-last-check next (a green row checked against
old code verifies nothing — the r14 gap), never-checked next, then
stalest-green first (registry.window_order).  These tests pin the scheduler's
invariants rather than any round's hand-picked list, so the rotation
self-corrects every round without edits:

* a query the driver last saw FAILING is always re-checked next round;
* a query whose declaring module changed after its last driver check is
  re-checked before any untouched green rotates;
* a newly declared query gets its first driver row immediately;
* no green query is skipped in favor of one with a fresher driver row;
* the full corpus stays locally exact-oracle-checked regardless of order
  (tools/verify_local.py + pytest).
"""

from __future__ import annotations

WINDOW = 50


def _names():
    from alertas_spark.registry import load_all

    return list(load_all())


def test_order_is_deterministic_and_complete():
    from alertas_spark.registry import (REGISTRY, _canonical_order,
                                        code_touched, driver_history,
                                        window_order)

    names = _names()
    # class prefix: reds, then never-checked ("touched since forever",
    # staleness −1 — ahead of every touched green so a module-heavy round
    # cannot starve a query of its FIRST driver row), then code-touched
    # greens stalest-first.  The COUNTS are deliberately not pinned: touched
    # drops as driver rows land and new drops to zero the moment the round's
    # CORRECTNESS artifact lands in the worktree, so only the ordering
    # property is asserted.
    hist = driver_history()
    touched = code_touched(hist)
    red = [n for n in names if n in hist and not hist[n][1]]
    tch = [n for n in names
           if n in hist and hist[n][1] and n in touched]
    new = [n for n in names if n not in hist]
    # touched greens are CAPPED at DRIVER_WINDOW − STALE_RESERVE − |red∪new|
    # (r15 verdict item 1) — the class prefix is red + new + capped-touched
    from alertas_spark.registry import DRIVER_WINDOW, STALE_RESERVE
    cap = max(DRIVER_WINDOW - STALE_RESERVE - len(red) - len(new), 0)
    head = len(red) + len(new) + min(len(tch), cap)
    assert names[:head] == red + new + tch[:cap]
    assert len(set(names)) == len(names)
    assert sorted(names) == sorted(REGISTRY)
    # recomputing the schedule reproduces the load order exactly — from the
    # CANONICAL (module-position) order, not raw dict insertion: a query
    # module importing another query module at load time (the r14 manifest
    # oracle pulls in operators.bpe) must not scramble the tiebreak
    assert window_order(_canonical_order(), hist, touched) == names
    # and the canonical order's module blocks follow _QUERY_MODULES position
    from alertas_spark.registry import _QUERY_MODULES
    pos = {m: i for i, m in enumerate(_QUERY_MODULES)}
    seq = [pos.get(REGISTRY[n].builder.__module__, len(_QUERY_MODULES))
           for n in _canonical_order()]
    assert all(a <= b for a, b in zip(seq, seq[1:]))


def test_red_queries_rechecked_first():
    from alertas_spark.registry import driver_history

    names = _names()
    hist = driver_history()
    red = [n for n in names if n in hist and not hist[n][1]]
    assert set(red) <= set(names[:WINDOW]), (
        f"driver-red queries pushed out of the re-check window: "
        f"{sorted(set(red) - set(names[:WINDOW]))}")
    # and they sort before everything else
    assert names[:len(red)] == [n for n in names if n in set(red)]


def test_new_queries_get_first_driver_row():
    from alertas_spark.registry import driver_history

    names = _names()
    hist = driver_history()
    new = [n for n in names if n not in hist]
    assert set(new) <= set(names[:WINDOW]), sorted(set(new) - set(names[:WINDOW]))


def test_no_stale_query_skipped_for_a_fresher_one():
    """Among UNTOUCHED greens the rotation is strictly stalest-first; a
    touched green legitimately jumps the rotation (its old row verifies
    nothing), so touched queries are excluded from the staleness check."""
    from alertas_spark.registry import code_touched, driver_history

    names = _names()
    hist = driver_history()
    touched = code_touched(hist)
    in_green = [hist[n][0] for n in names[:WINDOW]
                if n in hist and hist[n][1] and n not in touched]
    out_green = [hist[n][0] for n in names[WINDOW:]
                 if n in hist and hist[n][1] and n not in touched]
    if in_green and out_green:
        assert max(in_green) <= min(out_green), (
            "a fresher-checked query occupies a window slot while a staler one "
            "waits outside")


def test_touched_greens_precede_untouched_greens_up_to_cap():
    """Code-touched greens schedule ahead of untouched greens — up to the
    touched-class CAP (r15 verdict item 1): touched queries past
    ``DRIVER_WINDOW − STALE_RESERVE − |red ∪ new|`` queue after the
    stale-reserve greens so a module-heavy round cannot starve the rotation
    (the r14 gap — pipeline.py changed, queries unrechecked — still cannot
    recur for the first ``cap`` touched queries, and verify_local covers the
    rest the same round)."""
    from alertas_spark.registry import (DRIVER_WINDOW, STALE_RESERVE,
                                        code_touched, driver_history)

    names = _names()
    hist = driver_history()
    touched = code_touched(hist)
    red_or_new = [n for n in names
                  if n not in hist or (n in hist and not hist[n][1])]
    cap = max(DRIVER_WINDOW - STALE_RESERVE - len(red_or_new), 0)
    greens = [n for n in names if n in hist and hist[n][1]]
    tch_seen = 0
    seen_untouched = False
    for n in greens:
        if n in touched:
            tch_seen += 1
            if tch_seen <= cap:
                assert not seen_untouched, (
                    f"touched query {n} scheduled after an untouched green "
                    f"while under the cap")
        else:
            seen_untouched = True


def test_stale_reserve_holds_under_touched_flood():
    """The r15 failure mode, pinned: with enough touched queries to fill the
    window, the stalest untouched greens STILL land inside the first
    DRIVER_WINDOW slots — at least STALE_RESERVE of them."""
    from alertas_spark.registry import (DRIVER_WINDOW, STALE_RESERVE,
                                        window_order)

    n_tch, n_green = 60, 40
    names = ([f"t{i:02d}" for i in range(n_tch)]
             + [f"g{i:02d}" for i in range(n_green)])
    hist = {n: (5, True) for n in names[:n_tch]}
    # untouched greens staler the higher the index → g39 is stalest
    hist.update({f"g{i:02d}": (4 - i % 4, True) for i in range(n_green)})
    order = window_order(names, hist, touched=set(names[:n_tch]))
    window = order[:DRIVER_WINDOW]
    in_window_greens = [n for n in window if n.startswith("g")]
    assert len(in_window_greens) >= STALE_RESERVE, in_window_greens
    # and they are the STALEST untouched greens, not arbitrary ones
    green_rounds = sorted(hist[f"g{i:02d}"][0] for i in range(n_green))
    assert sorted(hist[n][0] for n in in_window_greens) == \
        green_rounds[:len(in_window_greens)]
    # overflow touched queries queue right after the reserve, before the
    # fresher greens — nothing is dropped
    assert sorted(order) == sorted(names)


def test_window_order_unit():
    from alertas_spark.registry import window_order

    names = ["a", "b", "c", "d", "e"]
    hist = {
        "a": (4, True),    # fresh green
        "b": (1, True),    # stale green
        "c": (3, False),   # red at last check
        # d never checked
        "e": (2, True),    # mid green
    }
    assert window_order(names, hist) == ["c", "d", "b", "e", "a"]
    # no history → insertion order (cold-start fallback)
    assert window_order(names, {}) == names
    # code-touched greens jump the rotation: after reds AND after
    # never-checked (a first driver row outranks a re-check), stalest touched
    # first; a red query stays in the red class even if its module was also
    # touched
    assert window_order(names, hist, touched={"a", "e", "c"}) == \
        ["c", "d", "e", "a", "b"]


def test_driver_history_reads_latest_row_per_query(tmp_path):
    import json

    from alertas_spark.registry import driver_history

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(
        {"q": {"rows_match": True, "hash_match": True, "err": None}}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(
        {"q": {"rows_match": None, "hash_match": None, "err": "boom"}}))
    hist = driver_history(str(tmp_path))
    assert hist["q"] == (2, False)


def test_driver_history_keys_subset_of_registry():
    """Live-artifact history is 1:1 with the current registry: renamed rows
    fold onto their new name (r4's simsearch_recall_eval →
    simsearch_recall_dashboard) and orphans drop."""
    from alertas_spark.registry import REGISTRY, driver_history

    _names()  # populate REGISTRY
    hist = driver_history()
    orphans = sorted(set(hist) - set(REGISTRY))
    assert orphans == [], orphans


def test_driver_history_folds_renamed_queries(tmp_path):
    import json

    from alertas_spark.registry import driver_history

    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(
        {"simsearch_recall_eval":
         {"rows_match": True, "hash_match": True, "err": None}}))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(
        {"simsearch_recall_dashboard":
         {"rows_match": True, "hash_match": True, "err": None}}))
    hist = driver_history(str(tmp_path))
    assert "simsearch_recall_eval" not in hist
    assert hist["simsearch_recall_dashboard"] == (5, True)


def test_scheduler_invariants_on_synthetic_history(tmp_path):
    """Pin the rotation against synthetic artifacts so the suite is green both
    before AND after a driver round lands (judge r6 item #1)."""
    import json

    from alertas_spark.registry import driver_history, window_order

    names = [f"q{i:02d}" for i in range(8)]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q00": {"rows_match": True, "hash_match": True, "err": None},
        "q01": {"rows_match": True, "hash_match": False, "err": None},  # red
        "q02": {"rows_match": True, "hash_match": True, "err": None},
        "q05": {"rows_match": True, "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q00": {"rows_match": True, "hash_match": True, "err": None},
        "q04": {"rows_match": None, "hash_match": None, "err": "boom"},  # red
    }))
    hist = driver_history(str(tmp_path))
    order = window_order(names, hist)
    # reds first (insertion-order tiebreak), never-checked next, stalest green
    assert order == ["q01", "q04",              # red at last check
                     "q03", "q06", "q07",       # never checked
                     "q02", "q05",              # r1 greens (stalest)
                     "q00"]                     # r2 green (freshest)


def test_git_file_times_orders_commits_and_dirty_files(tmp_path):
    """_git_file_times: newest-commit time per path, dirty files at mtime."""
    import subprocess

    from alertas_spark.registry import _git_file_times

    def git(*args, when=None):
        env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
               "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
               "HOME": str(tmp_path), "PATH": "/usr/bin:/bin"}
        if when:  # %ct is the COMMITTER time — set via env, not --date
            env["GIT_COMMITTER_DATE"] = env["GIT_AUTHOR_DATE"] = when
        subprocess.run(["git", "-C", str(tmp_path), *args],
                       check=True, capture_output=True, env=env)

    git("init", "-q")
    (tmp_path / "mod.py").write_text("x = 1\n")
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    git("add", "."); git("commit", "-qm", "one",
                         when="2026-01-01T00:00:00 +0000")
    # artifact committed LATER than the module → module not touched
    (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
    git("add", "."); git("commit", "-qm", "two",
                         when="2026-01-02T00:00:00 +0000")
    times = _git_file_times(str(tmp_path))
    assert times["mod.py"] < times["CORRECTNESS_r02.json"]
    assert times["mod.py"] == times["CORRECTNESS_r01.json"]
    # a dirty edit overrides the commit time with the (current) mtime
    (tmp_path / "mod.py").write_text("x = 2\n")
    times = _git_file_times(str(tmp_path))
    assert times["mod.py"] > times["CORRECTNESS_r02.json"]


def test_code_touched_live_subset():
    """Live invariants: touched ⊆ (driver-checked ∩ registry), and a module
    whose last git touch predates every artifact contributes nothing."""
    from alertas_spark.registry import REGISTRY, code_touched, driver_history

    _names()  # populate REGISTRY
    hist = driver_history()
    touched = code_touched(hist)
    assert touched <= (set(hist) & set(REGISTRY))


def test_all_queries_carry_oracles():
    from alertas_spark.registry import REGISTRY, load_all

    load_all()
    missing = [n for n, q in REGISTRY.items() if not q.oracle]
    # every declared query is exact-oracle-checked; genuinely non-SQL ops would
    # be a documented exception (none currently)
    assert missing == [], missing


def test_alert_corpus_complete():
    names = _names()
    alerts = [n for n in names if n.startswith("alerta_")]
    assert len(alerts) == 20
