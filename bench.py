"""Benchmark runner — the driver's per-round feedback loop.

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the noop sink (full computation, no driver collect) —
measuring the engine, not result serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from alertas_spark.registry import load_all
    from alertas_spark.session import get_spark

    spark = get_spark("alertas-bench")
    registry = load_all()

    # warm the JVM/Python workers so per-query numbers measure steady-state
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, q in registry.items():
        t0 = time.time()
        try:
            q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # keep the bench line parseable even on one failure
            timings[name] = -1.0
            print(f"# bench error {name}: {ex}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "declared_query_corpus_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
