"""Shared base relations: ``documento``, ``vista``, ``documentos_ativos``.

≙ the reference's session-global temp views (``/root/reference/src/alertas/
jobs.py:190-250``).  The rebuild expresses the two exclusions of ``documentos_ativos``
as **left anti joins** instead of LEFT JOIN + ``IS NULL`` (jobs.py:205-245) — identical
rows, and Spark plans the anti join without materializing the null-padded rows.

The result is cached + eagerly counted, exactly like jobs.py:249-250: a dozen alerts
re-scan it, so one materialization pays for twelve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework import codes


def build_view(ctx, name: str) -> DataFrame:
    if name == "documento":
        return ctx.table("exadata", "mcpr_documento")
    if name == "vista":
        return ctx.table("exadata", "mcpr_vista")
    if name == "documentos_ativos":
        return _documentos_ativos(ctx)
    raise KeyError(name)


def _documentos_ativos(ctx) -> DataFrame:
    documento = ctx.view("documento")
    vista = ctx.view("vista")

    # docs moved to the archival orgs (jobs.py:205-210)
    moved = (
        ctx.table("exadata", "mcpr_item_movimentacao")
        .join(
            ctx.table("exadata", "mcpr_movimentacao")
            .filter(F.col("movi_orga_dk_destino").isin(*codes.ARCHIVE_ORGS)),
            F.col("item_movi_dk") == F.col("movi_dk"),
        )
        .select("item_docu_dk")
    )

    # docs with an "arquivamento" andamento per package-dependent code sets
    # (jobs.py:211-243); the CASE over cod_pct becomes two explicit predicates
    pacote = ctx.table("exadata_aux", "atualizacao_pj_pacote").select("id_orgao", "cod_pct")
    is_arquivamento = (
        (F.col("cod_pct").isin(*codes.PCT_TUTELA)
         & F.col("stao_tppr_dk").isin(*codes.ARQUIVAMENTO_TUTELA))
        | ((F.col("cod_pct") >= 200)
           & F.col("stao_tppr_dk").isin(*codes.ARQUIVAMENTO_PIP))
    )
    archived = (
        documento.select("docu_dk", "docu_orgi_orga_dk_responsavel")
        .join(F.broadcast(pacote),
              F.col("id_orgao") == F.col("docu_orgi_orga_dk_responsavel"), "left")
        .join(vista.select("vist_docu_dk", "vist_dk"),
              F.col("vist_docu_dk") == F.col("docu_dk"))
        .join(ctx.table("exadata", "mcpr_andamento").select("pcao_dk", "pcao_vist_dk"),
              F.col("vist_dk") == F.col("pcao_vist_dk"))
        .join(ctx.table("exadata", "mcpr_sub_andamento").select("stao_pcao_dk", "stao_tppr_dk"),
              F.col("stao_pcao_dk") == F.col("pcao_dk"))
        .join(F.broadcast(ctx.table("exadata", "mcpr_tp_andamento").select("tppr_dk")),
              F.col("tppr_dk") == F.col("stao_tppr_dk"))
        .filter(is_arquivamento)
        .select("vist_docu_dk")
    )

    ativos = (
        documento.filter("docu_fsdc_dk = 1")            # jobs.py:246
        .filter("docu_tpst_dk != 11")                    # jobs.py:247
        .join(moved, F.col("item_docu_dk") == F.col("docu_dk"), "left_anti")
        .join(archived, F.col("vist_docu_dk") == F.col("docu_dk"), "left_anti")
    )
    ativos = ativos.cache()
    ativos.count()  # eager materialize ≙ jobs.py:249-250
    return ativos
