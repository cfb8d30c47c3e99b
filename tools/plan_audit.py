"""Physical-plan audit over the declared-query corpus.

For every query, inspects the formatted physical plan and reports the signals that
matter at 100 TB:

* ``scans``       — parquet scans, with ``PushedFilters`` / ``ReadSchema`` width;
* ``bhj/smj/bnl`` — broadcast-hash vs sort-merge vs nested-loop join counts;
* ``exchanges``   — shuffle count (the scale cost driver);
* ``codegen``     — WholeStageCodegen span count vs interpreted operators;
* flags: full-width scans (no column pruning), non-broadcast joins against tiny
  inputs, cartesian products.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def audit_plan(plan: str) -> dict:
    return {
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "exchange": len(re.findall(r"\(\d+\) Exchange", plan)),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        # cache reuse: consumers of a .cache()'d stage read InMemoryTableScan at
        # runtime; the parquet scans listed under its InMemoryRelation are the
        # cache-POPULATION lineage (executed once), not per-consumer re-reads —
        # so read `scans` alongside this column, not alone (alerta_prcr).
        "imts": len(re.findall(r"InMemoryTableScan", plan)),
    }


def main() -> None:
    from alertas_spark.registry import load_all
    from alertas_spark.session import get_spark

    spark = get_spark("plan-audit")
    registry = load_all()
    print(f"{'query':36} scans pushed bhj smj shj bnlj cart exch codegen imts")
    for name, q in sorted(registry.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            df = q.builder(spark, SF_DIR)
            plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils \
                .explainString(df._jdf.queryExecution(), "formatted")
        except Exception as ex:
            print(f"{name:36} ERROR {str(ex)[:60]}")
            continue
        a = audit_plan(plan)
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN")
        if a["smj"] and "alerta" not in name and a["bhj"] == 0:
            flags.append("no-broadcast")
        print(f"{name:36} {a['scans']:5} {a['pushed']:6} {a['bhj']:3} {a['smj']:3} "
              f"{a['shj']:3} {a['bnlj']:4} {a['cartesian']:4} {a['exchange']:4} "
              f"{a['codegen']:7} {a['imts']:4}  {' '.join(flags)}")


if __name__ == "__main__":
    main()
