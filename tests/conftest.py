from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".fixtures", "mprj")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("alertas-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def mprj_warehouse(tmp_path_factory):
    """MPRJ fixture inputs (read-only schemas) + a per-session writable alertas dir."""
    from alertas_spark.testing import fixtures

    fixtures.ensure_fixtures(FIXTURE_DIR)
    return FIXTURE_DIR


@pytest.fixture()
def ctx(spark, mprj_warehouse, tmp_path):
    """AlertContext over the shared input fixtures with a FRESH output warehouse:
    input schemas are symlinked, the writable ``alertas`` schema is per-test."""
    import shutil

    from alertas_spark.framework.context import AlertContext
    from alertas_spark.testing.fixtures import AS_OF

    wh = tmp_path / "warehouse"
    wh.mkdir()
    for schema in ("exadata", "exadata_aux", "opengeo", "alertas_compras"):
        os.symlink(os.path.join(mprj_warehouse, schema), wh / schema)
    (wh / "alertas").mkdir()
    yield AlertContext(spark=spark, warehouse=str(wh), as_of=AS_OF)
    spark.catalog.clearCache()
    shutil.rmtree(wh, ignore_errors=True)
