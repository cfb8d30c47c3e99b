"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship join-chain query on sf0.001; ``queries``/``oracle_sql``
expose every declared operator from SURVEY.md §2 plus the extension operators
(dedup / similarity search / text analysis / multimodal / sessionization), each paired
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def _registry():
    from alertas_spark.registry import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from alertas_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    return _registry()["revenue_by_nation"].builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from alertas_spark.session import apply_runtime_conf

    def wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return builder(spark, sf_dir)

        return run

    return {name: wrap(q.builder) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
