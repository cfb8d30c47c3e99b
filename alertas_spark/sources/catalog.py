"""Catalog binding — logical table names → storage.

The reference resolves every input through the Hive metastore
(``spark.table('<schema>.<table>')``, ``/root/reference/src/alertas/jobs.py:190,195``) and
names intermediates with temp views (``jobs.py:191,196,248``).  The rebuild keeps the same
two-level model but binds names to parquet directories (the driver testdata) or to any
Spark catalog database when running on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-generated testdata tables (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.  Parquet scan → column pruning + predicate pushdown
    happen automatically once downstream operators select/filter.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read nanos as long (legacy conf) and rebuild a microsecond
    timestamp — lossless here (generator emits µs precision)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every testdata table as a temp view (≙ the reference's base-view setup,
    ``jobs.py:190-196``) so SQL-form queries can reference them by name."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
