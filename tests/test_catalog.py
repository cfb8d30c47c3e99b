"""Catalog-backend contract: the same table operations against both backends.

The reference binds every alert to a Hive metastore (``/root/reference/src/alertas/
base.py:10-14`` enableHiveSupport; ``jobs.py:183-185`` saveAsTable).  The rebuild's
seam (framework/catalog.py) must behave identically whether tables are parquet
directories (PathCatalog — the sandbox) or session-catalog tables (MetastoreCatalog
— production).  Spark's in-memory session catalog stands in for Hive here: the API
surface (spark.table / saveAsTable / insertInto / DROP TABLE) is the same.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertas_spark.framework.catalog import MetastoreCatalog, PathCatalog
from alertas_spark.framework.context import AlertContext


@pytest.fixture(params=["path", "metastore"])
def catalog(request, spark, tmp_path):
    if request.param == "path":
        return PathCatalog(str(tmp_path / "wh"))
    return MetastoreCatalog(database_prefix="t_")


def test_write_exists_read_drop_roundtrip(spark, catalog):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert not catalog.table_exists(spark, "alertas", "roundtrip")
    catalog.write_table(spark, "alertas", "roundtrip", df)
    assert catalog.table_exists(spark, "alertas", "roundtrip")
    got = catalog.table(spark, "alertas", "roundtrip")
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]
    catalog.drop_table(spark, "alertas", "roundtrip")
    assert not catalog.table_exists(spark, "alertas", "roundtrip")


def test_append_accumulates(spark, catalog):
    df = spark.createDataFrame([(1,)], "id int")
    catalog.write_table(spark, "alertas", "app", df, mode="append")
    catalog.write_table(spark, "alertas", "app", df, mode="append")
    assert catalog.table(spark, "alertas", "app").count() == 2
    catalog.drop_table(spark, "alertas", "app")


def test_dynamic_partition_overwrite_touches_only_incoming(spark, catalog):
    """S10 semantics on both backends: overwriting with one partition's rows leaves
    the other partition intact (partitionOverwriteMode=dynamic from session conf)."""
    base = spark.createDataFrame(
        [(1, "202401"), (2, "202402")], "id int, dt_partition string")
    catalog.write_table(spark, "alertas", "hist", base, partition_by="dt_partition")
    feb = spark.createDataFrame([(99, "202402")], "id int, dt_partition string")
    catalog.write_table(spark, "alertas", "hist", feb,
                        mode="overwrite", partition_by="dt_partition")
    got = {(r.id, r.dt_partition)
           for r in catalog.table(spark, "alertas", "hist").collect()}
    assert got == {(1, "202401"), (99, "202402")}
    # permuted column order: the write contract is BY NAME on every backend
    # (the metastore path binds insertInto positionally underneath, and
    # saveAsTable stores partition columns last — alignment must not rely on
    # the caller's column order matching either)
    jan = spark.createDataFrame([("202401", 55)], "dt_partition string, id int")
    catalog.write_table(spark, "alertas", "hist", jan,
                        mode="overwrite", partition_by="dt_partition")
    got = {(r.id, r.dt_partition)
           for r in catalog.table(spark, "alertas", "hist").collect()}
    assert got == {(55, "202401"), (99, "202402")}
    catalog.drop_table(spark, "alertas", "hist")


def test_context_delegates_to_injected_catalog(spark, tmp_path):
    ctx = AlertContext(spark=spark, catalog=MetastoreCatalog(database_prefix="t_"))
    df = spark.createDataFrame([(7,)], "id int")
    ctx.write_table("alertas", "via_ctx", df)
    assert ctx.table_exists("alertas", "via_ctx")
    assert ctx.table("alertas", "via_ctx").agg(F.sum("id")).collect()[0][0] == 7
    ctx.drop_table("alertas", "via_ctx")
    assert not ctx.table_exists("alertas", "via_ctx")


def test_run_all_end_to_end_on_metastore(spark):
    """The full alert batch (compute → stage → snapshot+hist publish) against the
    session catalog: inputs registered as catalog tables, outputs land as catalog
    tables — the reference's Hive deployment shape (jobs.py:183-185), no paths."""
    import os

    from alertas_spark.framework import engine
    from alertas_spark.testing.fixtures import AS_OF, ensure_fixtures
    from tests.conftest import FIXTURE_DIR

    ensure_fixtures(FIXTURE_DIR)
    cat = MetastoreCatalog(database_prefix="e2e_")
    for schema, table in (("exadata", "mcpr_documento"), ("exadata", "mcpr_vista")):
        df = spark.read.parquet(
            os.path.join(FIXTURE_DIR, schema, f"{table}.parquet"))
        cat.write_table(spark, schema, table, df)
    ctx = AlertContext(spark=spark, catalog=cat, as_of=AS_OF)
    try:
        engine.run_all(ctx, siglas=("VADF",), quiet=True)
        snap = ctx.table("alertas", "mmps_alertas_mgp")
        assert snap.count() > 0
        hist = ctx.table("alertas", "hist_mmps_alertas_mgp")
        assert hist.count() == snap.count()
        assert spark.catalog.tableExists("e2e_alertas.hist_mmps_alertas_mgp")
    finally:
        for db in ("e2e_exadata", "e2e_alertas"):
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# --- events.ts encoding matrix ------------------------------------------------
# The driver testdata has shipped ts as parquet TIMESTAMP(NANOS) (r1-r3) and
# TIMESTAMP(MICROS) without timezone (r4+, reads as TIMESTAMP_NTZ).  load_table
# must normalize every encoding to TIMESTAMP so event-time operators
# (withWatermark, unix_micros) work regardless of which testdata round produced
# the files.

@pytest.mark.parametrize("unit,tz", [("ns", None), ("us", None), ("us", "UTC")])
def test_events_ts_encoding_matrix(spark, tmp_path, unit, tz):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alertas_spark.sources.catalog import load_table

    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:05:30"])
    tbl = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp(unit, tz=tz)),
        "user_id": pa.array([10, 20], pa.int64()),
        "value": pa.array([1.5, 2.5], pa.float64()),
    })
    sf_dir = str(tmp_path / f"enc_{unit}_{tz}")
    import os as _os
    _os.makedirs(sf_dir)
    pq.write_table(tbl, _os.path.join(sf_dir, "events.parquet"))

    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    got = sorted(r.ts.strftime("%Y-%m-%d %H:%M:%S") for r in df.select("ts").collect())
    assert got == ["2024-01-01 00:00:00", "2024-01-01 00:05:30"]
    # event-time ops that the NTZ regression broke must work on the loaded frame
    df.selectExpr("unix_micros(ts)").collect()


def test_all_tables_load_without_ntz_columns(spark):
    """Every table's timestamp-family columns normalize to TIMESTAMP at load —
    no TIMESTAMP_NTZ leaks into downstream operators regardless of the fixture
    generator's parquet encoding of the round."""
    from alertas_spark.sources.catalog import TABLES, load_table

    for name in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        assert ntz == [], f"{name}: NTZ columns leaked: {ntz}"
