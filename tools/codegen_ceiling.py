"""Measure the codegen ceiling of the BPE replace-chain tier.

``bpe_token_count_builtin`` unrolls the trained merge table into N codegen'd
``replace`` calls; its docstring claims the tier is "viable while the merge
table is expression-sized".  This probe turns the claim into a measured
crossover: sweep N_MERGES (16/64/256/1024), time BOTH apply tiers end-to-end
on the sf0.1 corpus — the codegen chain (plan build + codegen + execution of
N sequential replaces) against the Arrow/pandas tier (broadcast dict, one
Python pass per DISTINCT word) — and report where the chain loses.

Merge lists are the real trained table (16 rows) padded to N with
non-matching filler pairs: a replace that never matches still pays the full
state-string scan and its share of plan build + codegen, which is exactly
the per-merge cost being measured (padding with real merges is impossible —
the fixture vocabulary exhausts genuine pairs long before 1024).

Usage: python tools/codegen_ceiling.py [sf_dir]
Prints one row per (tier, N): wall seconds (min of 2) and plan-build
seconds; paste the table + verdict into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
#: includes 512 — the measured stack-overflow wall documented in SCALING.md
#: (must be reproducible with the tool as shipped) — and 4096, the
#: production-vocabulary point where only the pandas tier is viable.
SWEEP = (16, 64, 256, 512, 1024, 4096)


def main() -> None:
    from pyspark.sql import functions as F

    from alertas_spark.operators import memo
    from alertas_spark.operators.bpe import (_apply_merges,
                                             _apply_merges_ranked,
                                             _doc_token_counts,
                                             _merge_ranks, _merges_list)
    from alertas_spark.session import get_spark

    spark = get_spark("codegen-ceiling")
    real = _merges_list(spark, SF_DIR)

    def padded(n: int) -> list[tuple[str, str]]:
        fill = [(f"zzz{i}x", "qqq") for i in range(n - len(real))]
        return (real + fill)[:n]

    def run_builtin(merges):
        def ntok(word):
            s = F.concat(F.lit("||"),
                         F.regexp_replace(word, "(.)", "$1||"))
            for lhs, rhs in merges:
                s = F.replace(s, F.lit(f"|{lhs}||{rhs}|"),
                              F.lit(f"|{lhs}{rhs}|"))
            pipes = F.length(s) - F.length(F.replace(s, F.lit("|"),
                                                     F.lit("")))
            return (pipes / F.lit(2)).cast("bigint") - F.lit(1)

        t0 = time.perf_counter()
        df = _doc_token_counts(spark, SF_DIR, ntok)
        df._jdf.queryExecution().executedPlan()  # force analysis+planning
        t_plan = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, t_plan

    def run_pandas(merges):
        """The SHIPPED Arrow tier: the rank-count-independent ranked apply."""
        bc = spark.sparkContext.broadcast(merges)

        @F.pandas_udf("bigint")
        def ntok(words: pd.Series) -> pd.Series:
            ms = bc.value
            rk = _merge_ranks(ms)
            return words.map(lambda w: len(_apply_merges_ranked(w, ms, rk)))

        t0 = time.perf_counter()
        df = _doc_token_counts(spark, SF_DIR, ntok)
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, t_plan

    def run_chain(merges):
        """The r12-r14 Arrow tier (one replace pass per rank) — kept so the
        O(n_merges)-per-word wall stays measured."""
        bc = spark.sparkContext.broadcast(merges)

        @F.pandas_udf("bigint")
        def ntok(words: pd.Series) -> pd.Series:
            ms = bc.value
            return words.map(lambda w: len(_apply_merges(w, ms)))

        t0 = time.perf_counter()
        df = _doc_token_counts(spark, SF_DIR, ntok)
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, t_plan

    print(f"{'n_merges':>8} {'tier':>8} {'total_s':>8} {'plan_s':>7}")
    for n in SWEEP:
        ms = padded(n)
        for tier, fn in (("builtin", run_builtin), ("pandas", run_pandas),
                         ("chain", run_chain)):
            best = best_plan = float("inf")
            err = None
            for _ in range(2):  # min of 2: machine-noise guard
                memo.clear()
                try:
                    total, plan = fn(ms)
                except Exception as e:  # noqa: BLE001 — ceiling probe: the
                    # failure MODE (e.g. StackOverflow while converting the
                    # N-deep expression tree) is itself the measurement
                    err = f"{type(e).__name__}: {str(e).splitlines()[0][:90]}"
                    break
                if total < best:
                    best, best_plan = total, plan
            # a success is reported even when the OTHER pass failed (near
            # the wall the overflow is stack-state dependent; discarding a
            # real measurement would hide the exact point being probed) —
            # FAILED only when no pass produced a number
            if best != float("inf"):
                flaky = "  (1 of 2 passes failed)" if err else ""
                print(f"{n:>8} {tier:>8} {best:>8.2f} {best_plan:>7.2f}"
                      f"{flaky}", flush=True)
            else:
                print(f"{n:>8} {tier:>8} FAILED   {err}", flush=True)


if __name__ == "__main__":
    main()
