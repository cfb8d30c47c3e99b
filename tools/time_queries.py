"""Targeted per-query timing probe — bench.py's cold protocol over a subset.

Usage: python tools/time_queries.py q1 q2 ... [--passes N] [--sf DIR]

Same methodology as bench.py (warmup query + Arrow round-trip, memo cleared
before every timed run, noop sink, min over passes) but only for the named
queries, so a single change can be measured in seconds instead of re-running
the whole corpus.  Prints one JSON line {name: min_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
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

    spark = get_spark("alertas-probe")
    registry = load_all()

    # prewarm fixture bytes (page cache) + JVM/codegen/Arrow, bench.py protocol
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

    timings: dict[str, float] = {}
    for _p in range(passes):
        for name in names:
            memo.clear()
            spark.sparkContext.setJobDescription(f"probe: {name}")
            t0 = time.time()
            registry[name].builder(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            t = round(time.time() - t0, 3)
            prev = timings.get(name)
            timings[name] = min(t, prev) if prev is not None else t
            print(f"# pass {_p} {name}: {t:.3f}s", file=sys.stderr)
    memo.clear()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
