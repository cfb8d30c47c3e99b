"""Capture .explain("formatted") for named queries into plans/<dir>/.

Usage: python tools/capture_plans.py <outdir> <suffix> q1 q2 ...

Writes plans/<outdir>/<query>_<suffix>.txt for each query (suffix is
"before" or "after").  Uses sf0.1 (the bench scale) so plan shapes match the
measured configuration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from alertas_spark.operators import memo
    from alertas_spark.registry import load_all
    from alertas_spark.session import get_spark

    spark = get_spark("alertas-plans")
    registry = load_all()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(root, exist_ok=True)
    for name in names:
        memo.clear()
        df = registry[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(root, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    memo.clear()


if __name__ == "__main__":
    main()
