"""Single-join / chain alerts: VADF, GATE, OUVI, DORD, OFFP.

Each function ≙ one reference module ``alerta_<sigla>(options)`` (file:line cited);
semantics preserved, expressed Spark-first (window max instead of agg+join-back,
injected ``as_of`` instead of wall clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alertas_spark.framework import codes
from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def alerta_vadf(ctx: AlertContext) -> DataFrame:
    """VADF — vistas still open on already-closed documents
    (≙ /root/reference/src/alertas/alerta_vadf.py:22-33)."""
    documento = ctx.view("documento")
    vista = ctx.view("vista")
    out = (
        documento.join(vista, vista.vist_docu_dk == documento.docu_dk)
        .filter("docu_fsdc_dk != 1")
        .filter("docu_tpst_dk != 11")
        .filter("vist_dt_fechamento_vista IS NULL")
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("vist_dk")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("vist_orgi_orga_dk").cast("int").alias("alrt_orgi_orga_dk"),
        "alrt_key",
        F.col("vist_dk").alias("alrt_dk_referencia"),
    )


def alerta_gate(ctx: AlertContext) -> DataFrame:
    """GATE — documents with a GATE technical note newer than the last vista
    (≙ alerta_gate.py:58-76): no-vista docs ∪ docs where itcn_dt_cadastro >
    max(vist_dt_abertura_vista)."""
    documento = ctx.view("documento")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia")
    last_vista = ctx.view("vista").groupBy("vist_docu_dk").agg(
        F.max("vist_dt_abertura_vista").alias("dt_max_vista"))
    instrucao = ctx.table("exadata", "gate_info_tecnica")

    doc_vista = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == classe.cldc_dk, "left")
        .join(instrucao, F.col("docu_dk") == instrucao.itcn_docu_dk)
        .join(last_vista, F.col("docu_dk") == last_vista.vist_docu_dk, "left")
    )
    # The reference unions two disjoint filters over the same 3-way join
    # (alerta_gate.py:38), executing the join once per branch; a single OR filter
    # is row-identical (NULL dt_max_vista fails the > branch) and keeps one join
    # subtree in the physical plan.
    out = (
        doc_vista.filter("dt_max_vista IS NULL OR itcn_dt_cadastro > dt_max_vista")
        .withColumn("elapsed", F.datediff(ctx.as_of_col, "itcn_dt_cadastro").cast("int"))
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("itcn_dk")))
    )
    return out.select(
        F.col("itcn_dk").alias("alrt_dk_referencia"),
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("itcn_dt_cadastro").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
        "alrt_key",
    )


def alerta_ouvi(ctx: AlertContext) -> DataFrame:
    """OUVI — ombudsman expedients pending reception (≙ alerta_ouvi.py:98-116)."""
    documento = ctx.view("documento")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia")
    item = ctx.table("exadata", "mcpr_item_movimentacao")
    mov = ctx.table("exadata", "mcpr_movimentacao")
    out = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == classe.cldc_dk, "left")
        .join(item.join(mov, item.item_movi_dk == mov.movi_dk),
              F.col("docu_dk") == F.col("item_docu_dk"))
        .filter(f"docu_tpdc_dk = {codes.OUVIDORIA_DOC_TYPE}")
        .filter("docu_tpst_dk != 11")
        .filter("item_in_recebimento IS NULL")
        .filter(f"movi_tpgu_dk = {codes.GUIA_TYPE_REMESSA}")
        .filter("movi_dt_recebimento_guia IS NULL")
        .withColumn("alrt_key", uuidsha(F.col("docu_dk"), F.col("item_dk")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("movi_orga_dk_destino").alias("alrt_orgi_orga_dk"),
        "alrt_key",
        F.col("item_dk").alias("alrt_dk_referencia"),
    )


def alerta_dord(ctx: AlertContext) -> DataFrame:
    """DORD — owning órgão possibly stale: the LATEST tpsa=2 andamento sits in a
    different órgão than the document's (≙ alerta_dord.py:129-153).  The reference's
    agg-max + composite-key join-back (dord:140-147) becomes a window max + equality
    filter — one shuffle, identical rows including max-date ties."""
    documento = ctx.view("documento")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia")
    vista = ctx.view("vista")
    andamento = ctx.table("exadata", "mcpr_andamento").filter(
        f"pcao_tpsa_dk = {codes.ORGAO_UPDATE_TYPE}")

    joined = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == classe.cldc_dk, "left")
        .join(vista, vista.vist_docu_dk == documento.docu_dk)
        .join(andamento, F.col("vist_dk") == andamento.pcao_vist_dk)
    )
    w = Window.partitionBy("docu_dk")
    latest = joined.withColumn("last_date", F.max("pcao_dt_andamento").over(w)).filter(
        F.col("pcao_dt_andamento") == F.col("last_date"))
    return (
        latest.filter("docu_tpst_dk != 11")
        .filter("docu_fsdc_dk = 1")
        .filter("vist_orgi_orga_dk != docu_orgi_orga_dk_responsavel")
        .select(
            F.col("docu_dk").alias("alrt_docu_dk"),
            F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
            F.col("pcao_dt_andamento").alias("alrt_date_referencia"),
            F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        )
    )


def alerta_offp(ctx: AlertContext) -> DataFrame:
    """OFFP — ofício past its 365-day deadline (≙ alerta_offp.py:175-200).

    Note: the reference (disabled in its registry, jobs.py:106) builds the key from
    ``docu_dk``/``dt_fim_prazo`` AFTER aliasing them away (offp:196-199), which would
    not resolve; we key on the aliased columns — the working interpretation."""
    documento = ctx.view("documento").filter("docu_tpst_dk != 11").filter("docu_fsdc_dk = 1")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia")
    vista = ctx.view("vista")
    andamento = ctx.table("exadata", "mcpr_andamento").filter("pcao_dt_cancelamento IS NULL")
    sub = ctx.table("exadata", "mcpr_sub_andamento").filter(
        f"stao_tppr_dk = {codes.OFICIO_ID}")

    joined = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == classe.cldc_dk, "left")
        .join(vista, F.col("docu_dk") == vista.vist_docu_dk)
        .join(andamento, F.col("vist_dk") == andamento.pcao_vist_dk)
        .join(sub, F.col("pcao_dk") == sub.stao_pcao_dk)
        .withColumn("dt_fim_prazo",
                    F.expr("to_timestamp(date_add(pcao_dt_andamento, 365))"))
        .withColumn("elapsed", F.datediff(ctx.as_of_col, "dt_fim_prazo").cast("int"))
        .filter("elapsed > 0")
    )
    grouped = joined.groupBy(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("dt_fim_prazo").alias("alrt_date_referencia"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        F.col("elapsed").alias("alrt_dias_referencia"),
    ).agg(F.max("elapsed").alias("alrt_dias_passados"))
    return grouped.withColumn(
        "alrt_key", uuidsha(F.col("alrt_docu_dk"), F.col("alrt_date_referencia")))
