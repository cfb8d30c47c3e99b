"""The 20-alert registry as declared queries for the driver correctness gate.

Each ``alerta_<sigla>`` entry runs the real alert builder over the deterministic MPRJ
fixtures (alertas_spark/testing/fixtures.py — the generator is part of this repo, so
the driver can rebuild them anywhere) and pairs it with a SELF-CONTAINED DuckDB oracle
(read_parquet CTEs; independent re-derivation of the reference semantics, see
alertas_spark/testing/oracles.py).

The sha1 ``alrt_key`` column is excluded here because the driver's DuckDB session has
no sha1 function — key parity is pinned by tests/test_alert_oracles.py, which registers
sha1 as a UDF and compares keys cell-exactly.

``sf_dir`` is ignored: the alert corpus is a fixed-size domain workload (the
reference's production scale knob is the Hive mirror, not TPC-H sf).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

from alertas_spark.registry import declare
from alertas_spark.testing import oracles
from alertas_spark.testing.fixtures import AS_OF, ensure_fixtures

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fixtures", "mprj")

#: one AlertContext per SparkSession so the cached documentos_ativos base view is
#: built once and reused by all alert queries (≙ jobs.py:249-250)
_CTX_CACHE: dict[int, object] = {}


def _ctx(spark: SparkSession):
    from alertas_spark.framework.context import AlertContext

    key = id(spark)
    if key not in _CTX_CACHE:
        ensure_fixtures(FIXTURE_DIR)
        _CTX_CACHE[key] = AlertContext(spark=spark, warehouse=FIXTURE_DIR, as_of=AS_OF)
    return _CTX_CACHE[key]


def _make(sigla: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from alertas_spark.framework.engine import registry

        df = registry()[sigla].builder(_ctx(spark))
        if "alrt_key" in df.columns:
            df = df.drop("alrt_key")
        for field in df.schema.fields:  # ISO strings for cross-engine hashing
            if isinstance(field.dataType, (TimestampType, TimestampNTZType, DateType)):
                df = df.withColumn(field.name, F.col(field.name).cast("string"))
        return df

    run.__name__ = f"alerta_{sigla.lower()}"
    run.__doc__ = (f"{sigla} alert over the MPRJ fixture corpus "
                   f"(≙ /root/reference/src/alertas/alerta_{sigla.lower()}.py)")
    return run


#: generate at import so the oracle SQL's read_parquet paths are valid even if the
#: harness evaluates oracles before running the Spark side (no-op after first run)
ensure_fixtures(FIXTURE_DIR)

for _sigla in sorted(oracles.ORACLES):
    declare(f"alerta_{_sigla.lower()}",
            oracle=oracles.driver_sql(FIXTURE_DIR, _sigla))(_make(_sigla))
