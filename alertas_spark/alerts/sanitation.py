"""ISPS — sanitation indicators in the red, per municipality and órgão.

≙ /root/reference/src/alertas/alerta_isps.py:37-197.  Three indicator families (água,
esgoto, drenagem): each compares a municipality's indicators against the state
aggregate row (cod_mun = 33) or a computed state ratio, flags the losing side, and
unpivots the four indicator columns to rows.

Spark-first deltas (result-identical):
* the reference unpivots via four UNION ALL scans of the same view
  (isps:78-92,113-127,152-166); we ``explode(array(...))`` — one scan (SURVEY §2.6 U1);
* the state row / state aggregate attaches via ``crossJoin(broadcast(...))`` instead of
  ``JOIN ... ON R.cod_mun != A.cod_mun`` / ``ON 1 = 1`` (SURVEY §2.3 J6/J7) — no
  shuffled nested-loop join;
* the year-level memo table (isps:44-60, S16) is kept: sanitation data changes yearly,
  so a warm run is a single parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework import codes
from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha

AUX_TABLE = "mmps_alerta_isps_aux"  # ≙ options['isps_tabela_aux']

_OUT = ["alrt_orgi_orga_dk", "isps_indicador", "isps_municipio", "alrt_key",
        "isps_ano_referencia"]


def _unpivot_red(df: DataFrame, flags: list) -> DataFrame:
    """municipio + N flag columns → (municipio, indicador) rows, NULL flags dropped
    (≙ the UNION ALL ladders, isps:78-92)."""
    return (
        df.select("municipio", F.explode(F.array(*flags)).alias("indicador"))
        .filter("indicador IS NOT NULL")
    )


def _snis_family(ctx: AlertContext, table: str, ano: int, comparisons) -> DataFrame:
    """Água/esgoto pattern (isps:62-129): aggregated rows of the year vs the state row
    (cod_mun = 33); ``comparisons`` = [(column, 'lt'|'gt', label), ...]."""
    base = (
        ctx.table("opengeo", table)
        .filter(F.col("ano_referencia") == ano)
        .filter("cod_prest IS NULL")
    )
    cols = [c for c, _, _ in comparisons]
    state = base.filter(F.col("cod_mun") == codes.STATE_COD_MUN).select(
        *[F.col(c).alias(f"r_{c}") for c in cols])
    muni = base.filter(F.col("cod_mun") != codes.STATE_COD_MUN).select("municipio", *cols)
    flagged = muni.crossJoin(F.broadcast(state))
    flags = [
        F.when(F.col(c) < F.col(f"r_{c}") if op == "lt" else F.col(c) > F.col(f"r_{c}"),
               label)
        for c, op, label in comparisons
    ]
    return _unpivot_red(flagged, flags)


def _drenagem(ctx: AlertContext, ano: int) -> DataFrame:
    """Drainage (isps:131-167): the state aggregate is computed from base data as
    sum-ratios (A11), then attached to every municipality row."""
    agg = ctx.table("opengeo",
                    "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018").agg(
        (F.sum("ri013") / F.sum("ge008")).alias("r_in040"),
        ((F.sum("ri029") + F.sum("ri067")) / F.sum("ge006")).alias("r_in041"),
        (F.sum("ie024") / F.sum("ie017")).alias("r_in021"),
        (F.sum("ie019") / F.sum("ie017")).alias("r_in020"),
    )
    muni = (
        ctx.table("opengeo", "plataforma_amb_saneamento_snis_info_indic_drenagem")
        .filter(F.col("ano_referencia") == ano)
        .select("municipio", "in020", "in021", "in040", "in041")
    )
    flagged = muni.crossJoin(F.broadcast(agg))
    flags = [
        F.when(F.col("in020") < F.col("r_in020"),
               "Taxa de Cobertura de Pavimentação e Meio-Fio na Área Urbana do Município"),
        F.when(F.col("in021") > F.col("r_in021"),
               "Taxa de Cobertura de Vias Públicas com Redes ou Canais Pluviais "
               "Subterrâneos na Área Urbana"),
        F.when(F.col("in040") > F.col("r_in040"),
               "Parcela de Domicílios em Situação de Risco de Inundação"),
        F.when(F.col("in041") > F.col("r_in041"),
               "Parcela da População Impactada por Eventos Hidrológicos"),
    ]
    return _unpivot_red(flagged, flags)


def alerta_isps(ctx: AlertContext) -> DataFrame:
    # reference year = newest year in the água table (driver-side scalar, S15 isps:38-42)
    ano = (
        ctx.table("opengeo", "plataforma_amb_saneamento_snis_info_indic_agua")
        .agg(F.max("ano_referencia")).collect()[0][0]
    )
    if ctx.table_exists("alertas", AUX_TABLE):  # memo hit (isps:44-60)
        memo = ctx.table("alertas", AUX_TABLE).filter(
            F.col("isps_ano_referencia") == ano).select(*_OUT)
        if memo.count() > 0:
            return memo

    agua = _snis_family(
        ctx, "plataforma_amb_saneamento_snis_info_indic_agua", ano,
        [("in009", "lt", "Índice de Hidrometação"),
         ("in013", "gt", "Índice de Perdas de Faturamento"),
         ("in023", "lt", "Índice de Atendimento Urbano de Água"),
         ("in049", "gt", "Índice de Perdas na Distribuição")],
    )
    esgoto = _snis_family(
        ctx, "plataforma_amb_saneamento_snis_info_indic_esgoto", ano,
        [("in015", "lt", "Índice de Coleta de Esgoto"),
         ("in016", "lt", "Índice de Tratamento de Esgoto"),
         ("in024", "lt", "Índice de Atendimento Urbano de Esgoto Referido"),
         ("in046", "lt", "Índice de Esgoto Tratado Referido à Água Consumida")],
    )
    indicadores = agua.unionByName(esgoto).unionByName(_drenagem(ctx, ano))

    pacote = (
        ctx.table("exadata_aux", "atualizacao_pj_pacote")
        .filter(F.col("cod_pct").isin(*codes.ISPS_PACKAGES))
        .select("id_orgao")
    )
    orgaos = ctx.table("opengeo", "institucional_orgaos_meio_ambiente").select(
        "cod_orgao", "comarca")
    resultados = (
        pacote.join(F.broadcast(orgaos), F.col("cod_orgao") == F.col("id_orgao"))
        .join(indicadores, F.col("municipio") == F.col("comarca"))
        .select(
            F.col("id_orgao").alias("alrt_orgi_orga_dk"),
            F.col("indicador").alias("isps_indicador"),
            F.col("municipio").alias("isps_municipio"),
        )
        .withColumn("isps_ano_referencia", F.lit(ano).cast("int"))
        .withColumn("alrt_key", uuidsha(F.col("isps_indicador"), F.col("isps_municipio"),
                                        F.col("isps_ano_referencia")))
        .select(*_OUT)
    )
    ctx.write_table("alertas", AUX_TABLE, resultados, mode="append")  # memo isps:193-195
    return ctx.table("alertas", AUX_TABLE).filter(
        F.col("isps_ano_referencia") == ano).select(*_OUT)
