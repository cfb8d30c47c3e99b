"""Return-tracking alerts: BDPA (police returns overdue) and DCTJ/DNTJ (court returns
overdue).

BDPA ≙ /root/reference/src/alertas/alerta_bdpa.py:24-97; DCTJ/DNTJ are one template
with classe-hierarchy predicate + deadline as parameters (alerta_dctj.py:20-62 vs
alerta_dntj.py:20-60 differ only in LIKE vs NOT LIKE and 60 vs 120 days).

Spark-first deltas (result-identical):
* greatest-row-per-group via agg-max + composite-key join-back (bdpa:40-51,72-82)
  → window ``max(...) over (partition by docu_dk)`` + equality filter: one shuffle
  instead of two, ties preserved;
* the "no later return" LEFT JOIN + ``movi_dk IS NULL`` probe (dctj:49-57) →
  ``left_anti`` join with the same compound condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alertas_spark.framework import codes
from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def alerta_bdpa(ctx: AlertContext) -> DataFrame:
    """BDPA — docs sent down to a police precinct (docu_tpst_dk = 3) whose latest
    andamento is a 'baixa' with a deadline, and whose latest guia to a police órgão is
    past that deadline (≙ alerta_bdpa.py:24-97)."""
    documento = (
        ctx.view("documento").filter("docu_tpst_dk = 3").filter("docu_fsdc_dk = 1")
    )
    orga_externo = ctx.table("exadata", "mprj_orgao_ext").withColumnRenamed(
        "orge_nm_orgao", "nm_delegacia")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia")
    doc = (
        documento
        .join(orga_externo.select("orge_orga_dk", "nm_delegacia"),
              documento.docu_orge_orga_dk_deleg_origem == F.col("orge_orga_dk"), "left")
        .join(F.broadcast(classe.select("cldc_dk")),
              documento.docu_cldc_dk == classe.cldc_dk, "left")
        .join(ctx.view("vista").select("vist_dk", "vist_docu_dk"),
              F.col("vist_docu_dk") == F.col("docu_dk"))
    )
    andamento = (
        ctx.table("exadata", "mcpr_andamento")
        .filter(F.col("pcao_dt_andamento") >= F.lit("2013-01-01").cast("timestamp"))
        .select("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento")
    )
    doc_andamento = doc.join(andamento, F.col("vist_dk") == F.col("pcao_vist_dk"))
    # latest andamento per doc (bdpa:40-51) — window instead of join-back
    w_doc = Window.partitionBy("docu_dk")
    doc_last = (
        doc_andamento
        .withColumn("dt_last_andamento", F.max("pcao_dt_andamento").over(w_doc))
        .filter(F.col("pcao_dt_andamento") == F.col("dt_last_andamento"))
    )
    tp_baixa = (
        ctx.table("exadata_aux", "mmps_tp_andamento")
        .filter(F.col("id").isin(*codes.BAIXA_IDS)).select("id")
    )
    doc_baixa = (
        doc_last.join(ctx.table("exadata", "mcpr_sub_andamento")
                      .select("stao_pcao_dk", "stao_tppr_dk", "stao_nr_dias_prazo"),
                      F.col("pcao_dk") == F.col("stao_pcao_dk"))
        .join(F.broadcast(tp_baixa), F.col("stao_tppr_dk") == F.col("id"))
        .filter("stao_nr_dias_prazo IS NOT NULL")
    )
    movimentacao = ctx.table("exadata", "mcpr_movimentacao").withColumn(
        "movi_dt_guia",
        F.coalesce("movi_dt_recebimento_guia", "movi_dt_envio_guia",
                   "movi_dt_criacao_guia"),
    )
    doc_mov = (
        doc_baixa.join(ctx.table("exadata", "mcpr_item_movimentacao")
                       .select("item_docu_dk", "item_movi_dk"),
                       F.col("docu_dk") == F.col("item_docu_dk"))
        .join(movimentacao.select("movi_dk", "movi_dt_guia", "movi_orga_dk_destino"),
              F.col("item_movi_dk") == F.col("movi_dk"))
    )
    # latest guia per doc (bdpa:72-82) — window again
    doc_mov_dest = (
        doc_mov.withColumn("dt_guia", F.max("movi_dt_guia").over(w_doc))
        .filter(F.col("movi_dt_guia") == F.col("dt_guia"))
    )
    policia = (
        orga_externo.filter(F.col("orge_tpoe_dk").isin(*codes.POLICE_ORG_TYPES))
        .select(F.col("orge_orga_dk").alias("orga_dk_policia"))
    )
    out = (
        doc_mov_dest.join(policia, F.col("movi_orga_dk_destino") == F.col("orga_dk_policia"))
        .withColumn("dt_fim_prazo",
                    F.expr("date_add(dt_guia, cast(stao_nr_dias_prazo as int))"))
        .withColumn("elapsed", F.datediff(ctx.as_of_col, F.col("dt_fim_prazo")).cast("int"))
        .filter("elapsed > 0")
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("dt_fim_prazo")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_fim_prazo").cast("timestamp").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        F.col("nm_delegacia").alias("alrt_info_adicional"),
        "alrt_key",
    ).distinct()


def _alerta_tj(ctx: AlertContext, criminal: bool, deadline_days: int) -> DataFrame:
    """Shared DCTJ/DNTJ body: docs where MP is a party, last sent from an internal
    órgão to a court órgão, with no later return to the responsible órgão
    (≙ alerta_dctj.py:20-62 / alerta_dntj.py:20-60)."""
    documento = ctx.view("documento").filter("docu_fsdc_dk = 1")
    like = F.col("cldc_ds_hierarquia").like("PROCESSO CRIMINAL%")
    classe = (
        ctx.table("exadata_aux", "mmps_classe_hierarquia")
        .filter(like if criminal else ~like)
        .select("cldc_dk")
    )
    personagem = (
        ctx.table("exadata", "mcpr_personagem")
        .filter(F.col("pers_tppe_dk") == codes.MP_PARTY_ROLE)
        .select("pers_docu_dk", "pers_pess_dk")
    )
    pessoa = ctx.table("exadata", "mcpr_pessoa").select("pess_dk", "pess_nm_pessoa")
    mp_alias = ctx.table("exadata_aux", "mmps_alias").select("alias")
    item = ctx.table("exadata", "mcpr_item_movimentacao").select(
        "item_docu_dk", "item_movi_dk")
    movimentacao = ctx.table("exadata", "mcpr_movimentacao")
    interno = (
        ctx.table("exadata", "orgi_orgao")
        .filter(F.col("orgi_tpor_dk") == codes.INTERNAL_ORG_TYPE).select("orgi_dk")
    )
    externo = (
        ctx.table("exadata", "mprj_orgao_ext")
        .filter(F.col("orge_tpoe_dk").isin(*codes.COURT_ORG_TYPES))
        .select("orge_orga_dk")
    )

    sent_to_court = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == F.col("cldc_dk"))
        .join(personagem, F.col("pers_docu_dk") == F.col("docu_dk"))
        .join(pessoa, F.col("pers_pess_dk") == F.col("pess_dk"))
        .join(F.broadcast(mp_alias), F.col("pess_nm_pessoa") == F.col("alias"))
        .join(item, F.col("docu_dk") == F.col("item_docu_dk"))
        .join(movimentacao.select("movi_dk", "movi_orga_dk_origem",
                                  "movi_orga_dk_destino", "movi_dt_recebimento_guia"),
              F.col("item_movi_dk") == F.col("movi_dk"))
        .join(F.broadcast(interno), F.col("movi_orga_dk_origem") == F.col("orgi_dk"))
        .join(F.broadcast(externo), F.col("movi_orga_dk_destino") == F.col("orge_orga_dk"))
        .groupBy("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel")
        .agg(F.max("movi_dt_recebimento_guia").alias("movi_dt_guia"))
    )
    # anti-join against any LATER return received by the responsible órgão (dctj:49-57)
    returns = item.join(
        movimentacao.select(F.col("movi_dk").alias("r_movi_dk"),
                            F.col("movi_orga_dk_destino").alias("r_orga_destino"),
                            F.col("movi_dt_recebimento_guia").alias("r_dt_recebimento")),
        F.col("item_movi_dk") == F.col("r_movi_dk"))
    not_returned = sent_to_court.join(
        returns,
        (F.col("docu_dk") == F.col("item_docu_dk"))
        & (F.col("docu_orgi_orga_dk_responsavel") == F.col("r_orga_destino"))
        & (F.col("movi_dt_guia") < F.col("r_dt_recebimento")),
        "left_anti",
    )
    out = (
        not_returned
        .withColumn("dt_fim_prazo",
                    F.expr(f"to_timestamp(date_add(movi_dt_guia, {deadline_days}))"))
        .withColumn("elapsed", F.datediff(ctx.as_of_col, F.col("dt_fim_prazo")).cast("int"))
        .filter("elapsed > 0")
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_fim_prazo").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
    )


def alerta_dctj(ctx: AlertContext) -> DataFrame:
    """DCTJ — criminal docs at court >60 days without return (≙ alerta_dctj.py:20-62)."""
    return _alerta_tj(ctx, criminal=True, deadline_days=60)


def alerta_dntj(ctx: AlertContext) -> DataFrame:
    """DNTJ — non-criminal docs at court >120 days without return
    (≙ alerta_dntj.py:20-60)."""
    return _alerta_tj(ctx, criminal=False, deadline_days=120)
