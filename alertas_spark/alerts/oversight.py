"""ABR1 (annual CSMP communication) and COMP (procurement anomalies).

ABR1 ≙ /root/reference/src/alertas/alerta_abr1.py:21-58: counts, per tutela órgão, the
active procedures older than one year — fired only in April (or every month with
``ctx.abr1_all_months``, ≙ the reference's dev-schema branch abr1:23-26, plus the
hardcoded 2020-11 window abr1:37).  Also stages the qualifying procedures into the
``mmps_alerta_abr1_aux`` table (abr1:56).

COMP ≙ alerta_comp.py:23-39: anomalous purchases (variation ≥ 20%) cross-joined to
every Cidadania-Capital órgão (SURVEY §2.3 J8 — an intentional cross join; the órgão
side is tiny, so it is broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def alerta_abr1(ctx: AlertContext) -> DataFrame:
    """ABR1 — procedures >1 year old pending CSMP communication, per tutela órgão
    (≙ alerta_abr1.py:21-58)."""
    months = tuple(range(1, 13)) if ctx.abr1_all_months else (4,)
    fires = (ctx.as_of.year == 2020 and ctx.as_of.month == 11) \
        or ctx.as_of.month in months

    procedimentos = (
        ctx.view("documentos_ativos")
        .filter(F.datediff(F.last_day(ctx.as_of_col), F.col("docu_dt_cadastro"))
                / 365.2425 > 1)
        .filter("docu_dt_cancelamento IS NULL")
        .filter("docu_cldc_dk = 392")
        .filter("docu_tpst_dk != 3")
        .select("docu_orgi_orga_dk_responsavel", "docu_nr_mp", "docu_dt_cadastro",
                "docu_dk")
    )
    if not fires:  # month gate (abr1:36-39) — empty result, no aux write
        procedimentos = procedimentos.filter(F.lit(False))
    ctx.write_table("alertas", "mmps_alerta_abr1_aux", procedimentos)  # abr1:56

    pacote = (
        ctx.table("exadata_aux", "atualizacao_pj_pacote")
        .filter(F.upper(F.col("orgi_nm_orgao")).like("%TUTELA%"))
        .select("id_orgao")
    )
    out = (
        procedimentos.join(F.broadcast(pacote),
                           F.col("id_orgao") == F.col("docu_orgi_orga_dk_responsavel"))
        .groupBy(F.col("docu_orgi_orga_dk_responsavel").alias("id_orgao"))
        .agg(F.count(F.lit(1)).alias("nr_procedimentos"))
        .withColumn("ano_mes",
                    F.concat_ws("", F.year(ctx.as_of_col), F.month(ctx.as_of_col)))
        .withColumn("alrt_key", uuidsha(F.col("ano_mes")))
    )
    return out.select(
        F.col("id_orgao").alias("alrt_orgi_orga_dk"),
        F.col("nr_procedimentos").alias("abr1_nr_procedimentos"),
        "alrt_key",
        F.col("ano_mes").alias("abr1_ano_mes"),
    )


def alerta_comp(ctx: AlertContext) -> DataFrame:
    """COMP — purchases ≥20% off-pattern × every Cidadania-Capital órgão
    (≙ alerta_comp.py:23-39)."""
    compras = (
        ctx.table("alertas_compras", "compras_fora_padrao_capital")
        .filter("var_perc >= 20")
        .select("contratacao", "id_item", "contrato_iditem", "item", "dt_contratacao",
                "var_perc")
    )
    orgaos = (
        ctx.table("exadata_aux", "atualizacao_pj_pacote")
        .filter(F.upper(F.col("pacote_atribuicao")).like("%CIDADANIA%"))
        .filter(F.col("orgao_codamp").like("%CAPITAL%"))
        .select("id_orgao")
    )
    out = compras.crossJoin(F.broadcast(orgaos)).withColumn(
        "alrt_key", uuidsha(F.col("contrato_iditem")))
    return out.select(
        F.col("id_orgao").alias("alrt_orgi_orga_dk"),
        F.col("contratacao").alias("comp_contratacao"),
        F.col("item").alias("comp_item"),
        F.col("id_item").alias("comp_id_item"),
        F.col("contrato_iditem").alias("comp_contrato_iditem"),
        F.col("dt_contratacao").alias("comp_dt_contratacao"),
        F.col("var_perc").alias("comp_var_perc"),
        "alrt_key",
    )
