"""MVVD (repeat domestic-violence victims) and DT2I (second-instance movement).

MVVD ≙ /root/reference/src/alertas/alerta_mvvd.py:29-69 — the disjunctive-key join
(SURVEY §2.3 J10): a new victim matches a past victim on person id ∨ CPF ∨ RG ∨
(name, mother) ∨ (name, birthdate).  The reference runs a 5-way UNION ALL of
equi-joins + DISTINCT; this module instead explodes each victim into identity
facets (one row per non-null key, tagged by facet kind) and runs a SINGLE equi
join on the facet key — a result-identical rewrite that shuffles each side once
instead of five times.  See the inline note below for the facet encoding.

DT2I ≙ alerta_dt2i.py:27-97 — docs with a recent (≤7 days) andamento that also carry
a ciência followed by a recurso (appeal chain reaching second instance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alertas_spark.framework import codes
from alertas_spark.framework.context import AlertContext
from alertas_spark.functions.keys import uuidsha


def alerta_mvvd(ctx: AlertContext) -> DataFrame:
    """MVVD — domestic-violence docs registered in the last 30 days whose victim
    already appears as a victim in another DV doc (≙ alerta_mvvd.py:29-69)."""
    pessoa = ctx.table("exadata", "mcpr_pessoa_fisica").select(
        "pesf_pess_dk", "pesf_cpf", "pesf_nr_rg", "pesf_nm_pessoa_fisica",
        "pesf_nm_mae", "pesf_dt_nasc")
    vitima = (
        ctx.table("exadata", "mcpr_personagem")
        .filter(F.col("pers_tppe_dk").isin(*codes.VICTIM_ROLES))
        .select("pers_pess_dk", "pers_docu_dk")
    )
    pessoa_vitima = pessoa.join(vitima, F.col("pesf_pess_dk") == F.col("pers_pess_dk"))

    dv = F.col("docu_mate_dk") == codes.DOMESTIC_VIOLENCE_MATTER
    past = (
        pessoa_vitima.join(ctx.view("documento").filter(dv).select("docu_dk"),
                           F.col("pers_docu_dk") == F.col("docu_dk"))
        .select(
            F.col("pesf_pess_dk").alias("vict_pess_dk"),
            F.col("pesf_cpf").alias("vict_cpf"),
            F.col("pesf_nr_rg").alias("vict_rg"),
            F.col("pesf_nm_pessoa_fisica").alias("vict_nome"),
            F.col("pesf_nm_mae").alias("vict_mae"),
            F.col("pesf_dt_nasc").alias("vict_nasc"),
            F.col("docu_dk").alias("vict_docu_dk"),
        )
    )
    recent_docs = (
        ctx.view("documento")
        .filter(F.datediff(ctx.as_of_col, F.col("docu_dt_cadastro")) <= 30)
        .filter(dv)
    )
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia").select("cldc_dk")
    doc_vitima = pessoa_vitima.join(
        recent_docs.join(F.broadcast(classe),
                         recent_docs.docu_cldc_dk == F.col("cldc_dk"), "left"),
        F.col("pers_docu_dk") == F.col("docu_dk"),
    )

    # The reference runs FIVE equi-joins UNION ALL'ed (mvvd:49-65) because Spark
    # cannot hash-join an OR predicate — each branch re-scans both inputs (5× I/O at
    # 100 TB).  Result-identical rewrite: normalize every identity facet to a
    # (key_type, key_value) row via explode, then ONE equi join on the composite key
    # + DISTINCT.  NULL facets produce no key row (equality with NULL never matches
    # in the reference either); the CPF placeholder is excluded on the new-doc side
    # only (mvvd:55); two-column facets concatenate with a separator and null out if
    # either side is NULL.
    def facet_keys(pess, cpf, rg, nome, mae, nasc, *, new_side: bool):
        cpf_key = F.when(cpf != codes.CPF_PLACEHOLDER, cpf) if new_side else cpf
        pair = lambda a, b: F.when(a.isNotNull() & b.isNotNull(),
                                   F.concat_ws("\x01", a, b))  # separator absent from data
        return F.array(
            F.struct(F.lit("pess").alias("kt"), pess.cast("string").alias("kv")),
            F.struct(F.lit("cpf").alias("kt"), cpf_key.alias("kv")),
            F.struct(F.lit("rg").alias("kt"), rg.alias("kv")),
            F.struct(F.lit("nome_mae").alias("kt"), pair(nome, mae).alias("kv")),
            F.struct(F.lit("nome_nasc").alias("kt"),
                     pair(nome, nasc.cast("string")).alias("kv")),
        )

    past_keys = past.select(
        "vict_docu_dk",
        F.explode(facet_keys(F.col("vict_pess_dk"), F.col("vict_cpf"),
                             F.col("vict_rg"), F.col("vict_nome"), F.col("vict_mae"),
                             F.col("vict_nasc"), new_side=False)).alias("k"),
    ).select("vict_docu_dk", "k.kt", F.col("k.kv").alias("vict_kv")) \
        .filter("vict_kv IS NOT NULL")
    new_keys = doc_vitima.select(
        "docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        F.explode(facet_keys(F.col("pesf_pess_dk"), F.col("pesf_cpf"),
                             F.col("pesf_nr_rg"), F.col("pesf_nm_pessoa_fisica"),
                             F.col("pesf_nm_mae"), F.col("pesf_dt_nasc"),
                             new_side=True)).alias("k"),
    ).select("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
             "k.kt", F.col("k.kv").alias("new_kv")).filter("new_kv IS NOT NULL")

    out = (
        new_keys.join(past_keys,
                      (new_keys.kt == past_keys.kt)
                      & (F.col("new_kv") == F.col("vict_kv"))
                      & (F.col("vict_docu_dk") != F.col("docu_dk")))
        .withColumn("alrt_key", uuidsha(F.col("docu_dk")))
    )
    return out.select(
        F.col("docu_dk").alias("alrt_docu_dk"),
        F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
        F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
        "alrt_key",
    ).distinct()


def alerta_dt2i(ctx: AlertContext) -> DataFrame:
    """DT2I — docs moved in the last week that have a ciência andamento followed by a
    recurso andamento (≙ alerta_dt2i.py:27-97)."""
    documento = ctx.view("documento")
    classe = ctx.table("exadata_aux", "mmps_classe_hierarquia").select("cldc_dk")
    vista = ctx.view("vista").select("vist_dk", "vist_docu_dk")
    andamento = (
        ctx.table("exadata", "mcpr_andamento")
        .filter("pcao_dt_cancelamento IS NULL")
        .select("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento")
    )
    sub = ctx.table("exadata", "mcpr_sub_andamento").select("stao_pcao_dk", "stao_tppr_dk")

    doc_andamento = (
        documento.join(F.broadcast(classe), documento.docu_cldc_dk == F.col("cldc_dk"),
                       "left")
        .join(vista, F.col("vist_docu_dk") == F.col("docu_dk"))
        .join(andamento, F.col("vist_dk") == F.col("pcao_vist_dk"))
    )
    recente = (
        doc_andamento
        .withColumn("elapsed", F.datediff(ctx.as_of_col, F.col("pcao_dt_andamento"))
                    .cast("int"))
        .filter("elapsed <= 7")
        .select(F.col("docu_dk").alias("alrt_docu_dk"),
                F.col("docu_nr_mp").alias("alrt_docu_nr_mp"),
                "pcao_dt_andamento",
                F.col("docu_orgi_orga_dk_responsavel").alias("alrt_orgi_orga_dk"),
                "elapsed")
    )
    ciencia = (
        doc_andamento.join(sub.filter(F.col("stao_tppr_dk").isin(*codes.CIENCIA_IDS)),
                           F.col("pcao_dk") == F.col("stao_pcao_dk"))
        .select(F.col("docu_dk").alias("cie_docu_dk"),
                F.col("pcao_dt_andamento").alias("cie_dt_mov"))
    )
    recurso = (
        doc_andamento.join(sub.filter(F.col("stao_tppr_dk").isin(*codes.RECURSO_IDS)),
                           F.col("pcao_dk") == F.col("stao_pcao_dk"))
        .select(F.col("docu_dk").alias("rec_docu_dk"),
                F.col("pcao_dt_andamento").alias("rec_dt_mov"))
    )
    cie_rec = (
        ciencia.join(recurso, F.col("cie_docu_dk") == F.col("rec_docu_dk"))
        .filter("rec_dt_mov >= cie_dt_mov")
    )
    out = (
        cie_rec.join(recente, F.col("rec_docu_dk") == F.col("alrt_docu_dk"))
        .groupBy("alrt_docu_dk", "alrt_docu_nr_mp", "alrt_orgi_orga_dk")
        .agg(F.max("pcao_dt_andamento").alias("alrt_date_referencia"),
             F.min("elapsed").alias("alrt_dias_referencia"))
        .withColumn("alrt_key",
                    uuidsha(F.col("alrt_docu_dk"), F.col("alrt_date_referencia")))
    )
    return out.select("alrt_docu_dk", "alrt_docu_nr_mp", "alrt_date_referencia",
                      "alrt_orgi_orga_dk", "alrt_dias_referencia", "alrt_key")
