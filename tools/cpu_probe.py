"""Load-independent per-query cost probe: executor CPU + shuffle metrics.

Usage: python tools/cpu_probe.py q1 q2 ... [--passes N] [--sf DIR]

Wall clock on this box swings ±30-50% session-to-session (JIT state,
background load), so per-change wall comparisons across sessions are noise.
This probe runs the same cold protocol as ``tools/time_queries.py`` but
reports, per query, the SUM over its stages of executor CPU time and shuffle
write bytes/records read from the Spark UI REST API — deterministic-ish
quantities the optimization guide (§1.3) treats as primary evidence.  Prints
one JSON line {name: {"wall": s, "cpu": s, "sh_bytes": n, "sh_records": n}}
(min wall across passes; cpu/shuffle from the min-wall pass).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    names = args

    from alertas_spark.operators import memo
    from alertas_spark.registry import load_all
    from alertas_spark.session import get_spark

    spark = get_spark("alertas-cpu-probe")
    sc = spark.sparkContext
    registry = load_all()

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"

    def stages() -> list:
        with urllib.request.urlopen(f"{base}?status=complete") as r:
            return json.load(r)

    # warmup: fixture bytes + JVM/codegen/Arrow (time_queries protocol)
    import glob
    for pat in (os.path.join(sf_dir, "*.parquet"),
                os.path.join(sf_dir, "*.parquet", "*.parquet")):
        for f in glob.glob(pat):
            if os.path.isfile(f):
                with open(f, "rb") as fh:
                    while fh.read(1 << 22):
                        pass
    spark.range(1000).selectExpr("sum(id)").collect()
    from alertas_spark.operators import artifacts as _art
    _first = next(n for n in registry if n not in _art.PERSISTENT_QUERIES)
    registry[_first].builder(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    memo.clear()
    from pyspark.sql.functions import pandas_udf as _pudf
    _wu = _pudf(lambda s: s, "long")
    spark.range(1000).select(_wu("id")).write.format("noop") \
        .mode("overwrite").save()

    out: dict[str, dict] = {}
    for _p in range(passes):
        for name in names:
            memo.clear()
            seen = {s["stageId"] for s in stages()}
            sc.setJobDescription(f"cpu-probe: {name}")
            t0 = time.time()
            registry[name].builder(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            mine = [s for s in stages() if s["stageId"] not in seen]
            rec = {
                "wall": wall,
                "cpu": round(sum(s["executorCpuTime"] for s in mine) / 1e9, 3),
                "sh_bytes": sum(s["shuffleWriteBytes"] for s in mine),
                "sh_records": sum(s["shuffleWriteRecords"] for s in mine),
                "stages": len(mine),
            }
            prev = out.get(name)
            if prev is None or wall < prev["wall"]:
                out[name] = rec
            print(f"# pass {_p} {name}: {wall:.3f}s cpu {rec['cpu']:.2f}s "
                  f"shuffle {rec['sh_bytes']} B / {rec['sh_records']} rows",
                  file=sys.stderr)
    memo.clear()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
