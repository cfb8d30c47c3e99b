"""Deadline-family alerts: IC1A, PA1A, PPFP (+PPPV), NF30 (+NF120).

The four reference modules are near-clones of one "days since the last relevant
andamento" template (SURVEY §7: compare /root/reference/src/alertas/alerta_ic1a.py:33-67,
alerta_pa1a.py:33-60, alerta_ppfp.py:29-64, alerta_nf30.py:34-64).  The shared part —
active docs of a class, minus linked docs, left-joined to their live andamentos of the
relevant movement types — is factored into ``_docs_with_movements``; each alert keeps its
own aggregation/deadline logic.

Spark-first deltas from the reference (result-identical):
* LEFT JOIN + ``IS NULL`` exclusion subqueries → ``left_anti`` joins;
* wall-clock (``current_timestamp()``) → injected ``ctx.as_of`` clock.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework import codes
from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def _movement_rows(ctx: AlertContext, tppr_codes: tuple[int, ...]) -> DataFrame:
    """Live (non-cancelled) andamentos of the given movement types, keyed by document
    (≙ the vista⋈andamento⋈sub_andamento subquery, alerta_ic1a.py:50-57)."""
    vista = ctx.view("vista").select("vist_docu_dk", "vist_dk")
    andamento = (
        ctx.table("exadata", "mcpr_andamento")
        .filter("pcao_dt_cancelamento IS NULL")
        .select("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento")
    )
    sub = (
        ctx.table("exadata", "mcpr_sub_andamento")
        .filter(F.col("stao_tppr_dk").isin(*tppr_codes))
        .select("stao_dk", "stao_pcao_dk", "stao_tppr_dk")
    )
    return (
        vista.join(andamento, F.col("pcao_vist_dk") == F.col("vist_dk"))
        .join(sub, F.col("stao_pcao_dk") == F.col("pcao_dk"))
    )


def _docs_with_movements(
    ctx: AlertContext,
    cldc_pred: Column,
    tppr_codes: tuple[int, ...],
    exclude_sent_down: bool = True,
    exclude_grupo_carga: bool = False,
) -> DataFrame:
    """Active documents of a class, minus linked docs (corr_tpco 2/6), left-joined to
    their relevant movements (≙ the inner SELECT shared by ic1a:44-62 / pa1a:42-57 /
    ppfp:43-60 / nf30:43-60)."""
    docs = ctx.view("documentos_ativos").filter(cldc_pred)
    if exclude_sent_down:  # docu_tpst_dk != 3 (ic1a:59; absent in nf30)
        docs = docs.filter("docu_tpst_dk != 3")
    linked = (
        ctx.table("exadata", "mcpr_correlacionamento")
        .filter(F.col("corr_tpco_dk").isin(*codes.LINKED_DOC_TYPES))
        .select("corr_docu_dk2")
    )
    docs = docs.join(linked, F.col("corr_docu_dk2") == F.col("docu_dk"), "left_anti")
    if exclude_grupo_carga:  # ic1a:49,61 — docs carried by a "GRUPO DE ATUAÇÃO" órgão
        grupo = (
            ctx.table("exadata", "orgi_orgao")
            .filter("orgi_nm_orgao LIKE '%GRUPO DE ATUAÇÃO%'")
            .select("orgi_dk")
        )
        docs = docs.join(grupo, F.col("orgi_dk") == F.col("docu_orgi_orga_dk_carga"),
                         "left_anti")
    mov = _movement_rows(ctx, tppr_codes)
    return docs.select(
        "docu_dk", "docu_nr_mp", "docu_dt_cadastro", "docu_orgi_orga_dk_responsavel"
    ).join(mov, F.col("vist_docu_dk") == F.col("docu_dk"), "left")


_GROUP = ["docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel", "docu_dt_cadastro"]


def alerta_ic1a(ctx: AlertContext) -> DataFrame:
    """IC1A — inquéritos civis (class 392) without prorrogação for >1 year
    (≙ alerta_ic1a.py:27-80)."""
    prazo = 365
    base = _docs_with_movements(
        ctx, F.col("docu_cldc_dk") == 392,
        codes.IC1A_PRORROGACAO + codes.IC1A_INSTAURACAO,
        exclude_grupo_carga=True,
    )
    grouped = (
        base.groupBy(*_GROUP)
        .agg(F.max("pcao_dt_andamento").alias("max_andamento"),
             F.max("stao_dk").alias("stao_dk"))
        .withColumn("dt_inicio", F.coalesce("max_andamento", "docu_dt_cadastro"))
        .filter(F.datediff(ctx.as_of_col, F.col("dt_inicio")) > prazo)
    )
    # hierarquia of the max-stao movement (ic1a:65-66); fallback text ic1a:38
    sub = ctx.table("exadata", "mcpr_sub_andamento").select(
        F.col("stao_dk").alias("s_stao_dk"), "stao_tppr_dk")
    tp = ctx.table("exadata_aux", "mmps_tp_andamento").select("id", "hierarquia")
    out = (
        grouped.join(sub, F.col("s_stao_dk") == F.col("stao_dk"), "left")
        .join(F.broadcast(tp), F.col("id") == F.col("stao_tppr_dk"), "left")
        .withColumn("dt_fim_prazo", F.expr(f"to_timestamp(date_add(dt_inicio, {prazo}))"))
        .withColumn("elapsed",
                    (F.datediff(ctx.as_of_col, F.col("dt_inicio")) - prazo).cast("int"))
        .withColumn("hierarquia",
                    F.coalesce("hierarquia", F.lit("Cadastro do Procedimento no Sistema")))
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("dt_fim_prazo")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_fim_prazo").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        F.col("stao_dk").alias("alrt_dk_referencia"),
        F.col("hierarquia").alias("alrt_info_adicional"),
        "alrt_key",
    )


def alerta_pa1a(ctx: AlertContext) -> DataFrame:
    """PA1A — procedimentos administrativos (classes 51219-51223) without prorrogação
    for >1 year (≙ alerta_pa1a.py:27-72)."""
    prazo = 365
    base = _docs_with_movements(
        ctx, F.col("docu_cldc_dk").isin(51219, 51220, 51221, 51222, 51223),
        codes.PA1A_PRORROGACAO + codes.PA1A_INSTAURACAO,
    )
    out = (
        base.groupBy(*_GROUP)
        .agg(F.max("pcao_dt_andamento").alias("max_andamento"))
        .withColumn("dt_inicio", F.coalesce("max_andamento", "docu_dt_cadastro"))
        .filter(F.datediff(ctx.as_of_col, F.col("dt_inicio")) > prazo)
        .withColumn("dt_fim_prazo", F.expr(f"to_timestamp(date_add(dt_inicio, {prazo}))"))
        .withColumn("elapsed",
                    (F.datediff(ctx.as_of_col, F.col("dt_inicio")) - prazo).cast("int"))
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("dt_fim_prazo")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_fim_prazo").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        "alrt_key",
    )


def alerta_ppfp(ctx: AlertContext) -> DataFrame:
    """PPFP/PPPV — procedimento preparatório (class 395) past / near its 90-or-180-day
    deadline (≙ alerta_ppfp.py:24-75).  Emits sigla PPFP when past, PPPV when within 20
    days of the deadline (ppfp:31,63)."""
    autuacao, prorrogacao = codes.PPFP_AUTUACAO[0], codes.PPFP_PRORROGACAO[0]
    base = _docs_with_movements(
        ctx, F.col("docu_cldc_dk") == 395, codes.PPFP_PRORROGACAO + codes.PPFP_AUTUACAO,
    ).withColumns({
        "dt_instauracao": F.when(F.col("stao_tppr_dk") == autuacao,
                                 F.col("pcao_dt_andamento")),
        "nr_dias_prazo": F.when(F.col("stao_tppr_dk") == prorrogacao, 180).otherwise(90),
    })
    grouped = (
        base.groupBy(*_GROUP)
        .agg(F.max("dt_instauracao").alias("max_instauracao"),
             F.max("nr_dias_prazo").alias("nr_dias_prazo"))
        .withColumn("dt_inicio", F.coalesce("max_instauracao", "docu_dt_cadastro"))
        .withColumn("elapsed0", F.datediff(ctx.as_of_col, F.col("dt_inicio")))
        .filter(F.col("elapsed0") > F.col("nr_dias_prazo") - 20)
        .withColumn("dt_fim_prazo",
                    F.expr("to_timestamp(date_add(dt_inicio, nr_dias_prazo))"))
    )
    out = grouped.withColumns({
        "alrt_sigla": F.when(F.col("elapsed0") > F.col("nr_dias_prazo"), "PPFP")
                       .otherwise("PPPV"),
        "elapsed": F.abs(F.col("elapsed0") - F.col("nr_dias_prazo")).cast("int"),
    }).withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("dt_fim_prazo")))
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("dt_fim_prazo").alias("alrt_date_referencia"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        "alrt_sigla",
        "alrt_key",
    )


def alerta_nf30(ctx: AlertContext) -> DataFrame:
    """NF30/NF120 — notícia de fato (class 393) past its 30-or-120-day deadline and
    never converted (≙ alerta_nf30.py:28-76).  No sent-down exclusion (nf30 keeps
    docu_tpst_dk = 3 rows, unlike its siblings)."""
    base = _docs_with_movements(
        ctx, F.col("docu_cldc_dk") == 393,
        codes.NF30_CONVERSAO + codes.NF30_PRORROGACAO + codes.NF30_AUTUACAO,
        exclude_sent_down=False,
    ).withColumns({
        "dt_autuacao": F.when(F.col("stao_tppr_dk").isin(*codes.NF30_AUTUACAO),
                              F.col("pcao_dt_andamento")),
        "flag_conversao": F.when(F.col("stao_tppr_dk").isin(*codes.NF30_CONVERSAO), 1)
                           .otherwise(0),
        "nr_dias_prazo": F.when(F.col("stao_tppr_dk").isin(*codes.NF30_PRORROGACAO), 120)
                          .otherwise(30),
    })
    grouped = (
        base.groupBy(*_GROUP)
        .agg(F.max("dt_autuacao").alias("max_autuacao"),
             F.max("flag_conversao").alias("max_conversao"),
             F.max("nr_dias_prazo").alias("nr_dias_prazo"))
        .filter("max_conversao = 0")  # HAVING nf30:62
        .withColumn("dt_inicio", F.coalesce("max_autuacao", "docu_dt_cadastro"))
        .withColumn("elapsed", F.datediff(ctx.as_of_col, F.col("dt_inicio")).cast("int"))
        .filter(F.col("elapsed") > F.col("nr_dias_prazo"))
    )
    out = grouped.withColumns({
        "alrt_sigla": F.when(F.col("elapsed") > 120, "NF120").otherwise("NF30"),
        "alrt_key": uuidsha(F.col("docu_dk"), F.col("dt_inicio")),
    })
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_inicio").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        "alrt_key",
        "alrt_sigla",
    )
