"""Police-report alerts over the opengeo schema: RO and FEBT.

RO ≙ /root/reference/src/alertas/alerta_ro.py:24-48 — serial-gap analysis of police
report numbers (`DDD-SSSSS/YYYY`): expected count from the max serial vs distinct
received, per precinct, current year.

FEBT ≙ alerta_febt.py:22-45 — precincts silent for >30 days since their last report
release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def alerta_ro(ctx: AlertContext) -> DataFrame:
    """RO — missing police reports per precinct (≙ alerta_ro.py:24-48)."""
    proc = ctx.table("opengeo", "seg_pub_in_pol_procedimento")
    faltantes = (
        proc.filter(F.substring("proc_numero", 11, 4).cast("int")
                    == F.year(ctx.as_of_col))
        .groupBy(F.substring("proc_numero", 1, 3).cast("int").alias("nr_delegacia"))
        .agg(
            F.max("proc_numero").alias("max_proc"),
            (F.substring(F.max("proc_numero"), 5, 5).cast("int")
             - F.countDistinct("proc_numero")).alias("qt_ros_faltantes"),
        )
        .filter("qt_ros_faltantes >= 1")
    )
    cisp = ctx.table("exadata_aux", "tb_pip_cisp").select(
        "cisp_codigo", "pip_codigo", "cisp_nome_apresentacao")
    out = (
        faltantes.join(F.broadcast(cisp), F.col("nr_delegacia") == F.col("cisp_codigo"))
        .withColumn("alrt_key", uuidsha(F.col("nr_delegacia"), F.col("max_proc")))
    )
    return out.select(
        F.col("nr_delegacia").alias("ro_nr_delegacia"),
        F.col("pip_codigo").alias("alrt_orgi_orga_dk"),
        F.col("qt_ros_faltantes").alias("ro_qt_ros_faltantes"),
        "alrt_key",
        F.col("max_proc").alias("ro_max_proc"),
        F.col("cisp_nome_apresentacao").alias("ro_cisp_nome_apresentacao"),
    )


def alerta_febt(ctx: AlertContext) -> DataFrame:
    """FEBT — precincts with no report release for >30 days (≙ alerta_febt.py:22-45)."""
    proc = ctx.table("opengeo", "seg_pub_in_pol_procedimento")
    ultimo = (
        proc.groupBy(F.substring("proc_numero", 1, 3).cast("int")
                     .alias("numero_delegacia"))
        .agg(F.max("data_liberacao").alias("ultima_liberacao"))
        .withColumn("diff_ultimo_envio",
                    F.datediff(ctx.as_of_col, F.col("ultima_liberacao")))
    )
    cisp = ctx.table("exadata_aux", "tb_pip_cisp").select(
        "cisp_codigo", "pip_codigo", "cisp_nome_apresentacao")
    out = (
        ultimo.join(F.broadcast(cisp),
                    (F.col("numero_delegacia") == F.col("cisp_codigo"))
                    & (F.col("diff_ultimo_envio") > 30))
        .withColumn("numero_delegacia", F.col("numero_delegacia").cast("string"))
        .withColumn("alrt_key",
                    uuidsha(F.col("numero_delegacia"), F.col("ultima_liberacao")))
    )
    return out.select(
        F.col("numero_delegacia").alias("ro_nr_delegacia"),
        F.col("pip_codigo").alias("alrt_orgi_orga_dk"),
        F.col("cisp_nome_apresentacao").alias("ro_cisp_nome_apresentacao"),
        "alrt_key",
    )
