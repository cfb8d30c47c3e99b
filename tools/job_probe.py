"""Job-timeline probe: where does a query's wall clock go — jobs or gaps?

Usage: python tools/job_probe.py q1 [q2 ...] [--sf DIR] [--passes N]

Runs each named query cold (memo cleared, noop sink, same warmup as
tools/time_queries.py) and, from the UI REST API, reconstructs the query's
JOB TIMELINE: per job its submission/completion stamps, stage count and task
time.  Reports, per query:

  wall          total wall clock of the timed pass
  n_jobs        Spark jobs the pass submitted
  n_stages      completed stages across those jobs
  job_covered   union of [submission, completion] intervals over all jobs
  driver_gap    wall - job_covered  (planning, broadcast collect, py4j, AQE
                re-planning between jobs — the driver-side floor)

The guide (§7.3) calls the driver_gap term out explicitly: when nothing is
running, the driver is doing single-threaded work.  On the job-count-bound
trainer chains this probe separates "too many tiny sequential stages"
(job_covered dominates, each job sub-second) from "driver overhead between
jobs" (driver_gap dominates).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    args = list(sys.argv[1:])
    passes = 1
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

    spark = get_spark("alertas-job-probe")
    sc = spark.sparkContext
    registry = load_all()
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    # warmup: fixture bytes + JVM/codegen/Arrow (time_queries protocol)
    import glob
    for pat in (os.path.join(sf_dir, "*.parquet"),
                os.path.join(sf_dir, "*.parquet", "*.parquet")):
        for f in glob.glob(pat):
            if os.path.isfile(f):
                with open(f, "rb") as fh:
                    while fh.read(1 << 22):
                        pass
    first = next(iter(registry))
    registry[first].builder(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    memo.clear()
    from pyspark.sql.functions import pandas_udf as _pudf
    _wu = _pudf(lambda s: s, "long")
    spark.range(1000).select(_wu("id")).write.format("noop") \
        .mode("overwrite").save()

    def ts(s: str) -> float:
        # "2026-08-18T12:34:56.789GMT"
        from datetime import datetime, timezone
        return datetime.strptime(s.replace("GMT", "+0000"),
                                 "%Y-%m-%dT%H:%M:%S.%f%z") \
            .astimezone(timezone.utc).timestamp()

    out: dict[str, dict] = {}
    for name in names:
        best = None
        for _p in range(passes):
            memo.clear()
            jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
            t0 = time.time()
            registry[name].builder(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            wall = time.time() - t0
            jobs = [j for j in _get(f"{base}/jobs")
                    if j["jobId"] not in jobs_before]
            iv = sorted((ts(j["submissionTime"]), ts(j["completionTime"]))
                        for j in jobs if "completionTime" in j)
            covered, cur_s, cur_e = 0.0, None, None
            for s, e in iv:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            if cur_e is not None:
                covered += cur_e - cur_s
            rec = {
                "wall": round(wall, 3),
                "n_jobs": len(jobs),
                "n_stages": sum(len(j["stageIds"]) for j in jobs),
                "job_covered": round(covered, 3),
                "driver_gap": round(wall - covered, 3),
                "jobs": [
                    {"id": j["jobId"],
                     "dur": round(ts(j["completionTime"])
                                  - ts(j["submissionTime"]), 3),
                     "stages": len(j["stageIds"]),
                     "desc": (j.get("description") or j.get("name", ""))[:80]}
                    for j in sorted(jobs, key=lambda j: j["jobId"])
                    if "completionTime" in j],
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        out[name] = best
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
