"""SparkSession factory — the rebuild's single place for engine configuration.

Replaces the reference's scattered tuning (``/root/reference/alertas.sh:3-27`` cluster
knobs, ``src/alertas/base.py:10-14`` Hive-enabled singleton, ``src/alertas/jobs.py:124-125``
in-code conf). Design decisions vs the reference:

* AQE **on** (runtime join re-planning, skew-join splitting, shuffle-partition
  coalescing) instead of the reference's ``autoBroadcastJoinThreshold=-1`` + manual
  ``broadcast()`` hints on every dim (``jobs.py:125``). On a 1000-executor / 100 TB run
  AQE re-plans from runtime stats, which beats static hints.
* Session timezone pinned to UTC so date semantics are reproducible across
  driver/executors and match the DuckDB oracle.
* Arrow enabled for any pandas-UDF path (extension operators).
* ``partitionOverwriteMode=dynamic`` retained (hist-partition rewrite,
  ``jobs.py:124,311-318``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configuration applied when *we* build the session (tests, bench, CLI).  When the
#: driver hands us an existing session (``__spark_entry__.entry``) we only apply the
#: runtime-settable subset.
BUILD_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # hist tables partition by dt_partition=yyyyMM *string* (jobs.py:295-318); without
    # this, path-based reads would re-infer the partition value as int
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # 128 MiB input splits: at 100 TB this yields ~800k tasks, amortized fine across
    # 1000 executors; locally it keeps task count sane.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # the sandbox is a 32-thread / 128 GiB single-JVM box; the 1 GiB default
    # driver heap OOMs the first time AQE builds a non-trivial broadcast
    # (found by tools/scale_probe.py at 10x data).  12g, not 8g: local[32]
    # concentrates THIRTY-TWO executor-threads' aggregation buffers in one
    # heap — ~10x the per-heap concurrency of a typical 4-8-core cluster
    # executor — and the 100x probe's sketch stage (32 tasks x 3 GK summaries
    # at accuracy 2e5) thrashed GC at 8g (r9).  On a real cluster the
    # submitter sets executor memory; only applied when WE build the session.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
}

#: Settings safe to apply on an already-running session.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def default_shuffle_partitions() -> int:
    # local[32] → 32 shuffle partitions; a real cluster sets this (or relies on AQE
    # coalescing from a high initial value).
    return int(os.environ.get("SPARK_GRAFT_SHUFFLE", os.environ.get("SPARK_GRAFT_CPUS", "32")))


def get_spark(app_name: str = "alertas-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session with the engine's standard configuration."""
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    conf = dict(BUILD_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or default_shuffle_partitions())
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable conf subset to a session we did not build."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - locked conf on some deployments
            pass
    return spark
