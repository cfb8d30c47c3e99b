"""Subprocess body for the two-session artifact-store proof (test_artifacts.py).

Each invocation is a genuinely separate Python process + Spark JVM.  Phase
``first`` trains and persists; phase ``second`` must answer the same queries
from ``$ALERTAS_ARTIFACTS_DIR`` alone — zero builder invocations — and, for
the fully-artifact-derived IVF query, with a plan that scans ``_artifacts/``
and never touches ``embeddings.parquet``.

Prints one JSON line: {"build_calls": N, "rows": {...}, "ivf_plan_sources": [...]}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    phase = sys.argv[1]
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    from alertas_spark.operators import artifacts
    from alertas_spark.operators.kmeans import simsearch_topk_ivf_trained
    from alertas_spark.operators.pq import pq_encode_trained

    ivf = simsearch_topk_ivf_trained(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivf.explain("formatted")
    plan = buf.getvalue()
    sources = sorted({line.split("[file:")[-1].split("]")[0]
                      for line in plan.splitlines() if "[file:" in line})
    rows = {
        "ivf": sorted([r.query_id, r.cand_id, r.rnk, r.score]
                      for r in ivf.collect()),
        "pq": sorted([r.vec_id, r.code_1, r.code_2, r.code_3, r.code_4, r.qerr]
                     for r in pq_encode_trained(spark, SF).collect()),
    }
    out = {"phase": phase, "build_calls": artifacts.build_count(),
           "rows": rows, "ivf_plan_sources": sources}
    print("\nRESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
