"""Framework unit tests: key hashing, normalization contract, hist publication.

≙ SURVEY §5 item 2 — key construction (jobs.py:266-271), null-padding (jobs.py:273-274),
hist-partition merge (jobs.py:295-318) under first-run / same-day-rerun / next-day cases.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from alertas_spark.framework import engine, schemas
from alertas_spark.functions.keys import alert_key, uuidsha


def test_uuidsha_matches_reference_serialization(spark):
    """sha1(concat of canonical strings): NULL→'', timestamps→'yyyy-MM-dd HH:mm:ss',
    non-ascii stripped (≙ utils.py:26-43 limpa+uuidsha)."""
    df = spark.createDataFrame(
        [(1, "café", dt.datetime(2024, 1, 2, 3, 4, 5)), (2, None, None)],
        "a int, b string, c timestamp",
    ).select(uuidsha(F.col("a"), F.col("b"), F.col("c")).alias("k"))
    got = [r.k for r in df.collect()]
    assert got[0] == hashlib.sha1(b"1caf2024-01-02 03:04:05").hexdigest()
    assert got[1] == hashlib.sha1(b"2").hexdigest()


def test_alert_key_format(spark):
    df = spark.createDataFrame([(10, 77), (None, 77)], "k int, orga int").select(
        alert_key("VADF", F.col("k"), F.col("orga")).alias("ak"))
    assert [r.ak for r in df.collect()] == ["VADF.10.77", "VADF.KEYUNDEFINED.77"]


def test_normalize_pads_and_orders(spark):
    df = spark.createDataFrame([(5, 9)], "alrt_docu_dk int, alrt_orgi_orga_dk int")
    out = engine.normalize(df, "VADF", schemas.MGP)
    assert out.columns == [f.name for f in schemas.MGP.fields]
    row = out.collect()[0]
    assert row.alrt_sigla == "VADF"
    assert row.alrt_key == "VADF.KEYUNDEFINED.9"
    assert row.alrt_info_adicional is None  # null-padded


def test_normalize_null_orgao_gives_null_key(spark):
    """concat (not concat_ws) semantics: NULL órgão → NULL alrt_key (jobs.py:266-271)."""
    df = spark.createDataFrame([(5, None)], "alrt_docu_dk int, alrt_orgi_orga_dk int")
    assert engine.normalize(df, "X", schemas.MGP).collect()[0].alrt_key is None


def test_publish_hist_merge(ctx):
    """First publish creates snapshot+hist; same-month republish keeps one row per
    dt_calculo; prior-day rows of the month survive (jobs.py:295-318)."""
    spark = ctx.spark
    fam = "mmps_alertas_mgp"

    def stage(rows):
        df = engine.normalize(
            spark.createDataFrame(rows, "alrt_docu_dk int, alrt_orgi_orga_dk int"),
            "VADF", schemas.MGP)
        ctx.drop_table("alertas", f"temp_{fam}")
        ctx.write_table("alertas", f"temp_{fam}", df, mode="append")

    stage([(1, 10), (2, 20)])
    engine.publish(ctx, fam)
    assert ctx.table("alertas", fam).count() == 2
    hist = ctx.table("alertas", f"hist_{fam}")
    assert hist.count() == 2
    ym = ctx.as_of.strftime("%Y%m")
    assert {r.dt_partition for r in hist.select("dt_partition").collect()} == {ym}

    # simulate a prior-day run already in the month's partition
    prior = hist.withColumn("dt_calculo", F.lit("20240401"))
    ctx.write_table("alertas", f"hist_{fam}_prior", prior)
    prior_df = ctx.table("alertas", f"hist_{fam}_prior")
    ctx.drop_table("alertas", f"hist_{fam}")
    ctx.write_table("alertas", f"hist_{fam}", prior_df, partition_by="dt_partition")

    # same-day rerun with 3 rows: month partition = prior-day 2 + today 3
    stage([(1, 10), (2, 20), (3, 30)])
    engine.publish(ctx, fam)
    hist2 = ctx.table("alertas", f"hist_{fam}")
    assert hist2.count() == 5
    assert hist2.filter(F.col("dt_calculo") == "20240401").count() == 2


def test_run_all_single_alert_end_to_end(ctx):
    """Mini e2e through run_all: compute VADF, stage, publish, types table."""
    engine.run_all(ctx, siglas=("VADF",))
    engine.generate_types_table(ctx)
    snap = ctx.table("alertas", "mmps_alertas_mgp")
    assert snap.count() > 0
    assert snap.filter("alrt_sigla != 'VADF'").count() == 0
    assert snap.filter("alrt_key NOT LIKE 'VADF.%'").count() == 0
    assert ctx.table("alertas", "mmps_alertas_tipos").count() == 25


def test_concurrent_staging_equals_serial(ctx):
    """The r18 concurrent compute phase (per-sigla staging tables unioned at
    publish) publishes the SAME rows as the serial reference shape — and
    leaves no staging tables behind."""
    fam = "mmps_alertas_mgp"
    siglas = ("VADF", "OUVI")

    ctx.spark.conf.set("spark.alertas.batch.alertParallelism", "4")
    try:
        engine.run_all(ctx, siglas=siglas, quiet=True)
        concurrent_rows = {tuple(r) for r in ctx.table("alertas", fam).collect()}
        ctx.drop_table("alertas", fam)
        ctx.drop_table("alertas", f"hist_{fam}")

        ctx.spark.conf.set("spark.alertas.batch.alertParallelism", "1")
        engine.run_all(ctx, siglas=siglas, quiet=True)
        serial_rows = {tuple(r) for r in ctx.table("alertas", fam).collect()}
    finally:
        ctx.spark.conf.unset("spark.alertas.batch.alertParallelism")

    assert concurrent_rows == serial_rows and concurrent_rows
    # per-sigla staging cleaned up by publish
    for s in siglas:
        assert not ctx.table_exists("alertas", engine._stage_name(fam, s))
