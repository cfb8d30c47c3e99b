"""DuckDB oracles for the 20-alert library.

Each oracle is an INDEPENDENT re-derivation of one reference alert's semantics
(/root/reference/src/alertas/alerta_*.py), written directly against the reference's
SQL/DataFrame logic — agg-max + join-back, LEFT JOIN + IS NULL — while the Spark
implementation uses windows / anti-joins.  Agreement therefore checks the rewrite, not
just the transcription.

Translation conventions (Spark → DuckDB):
* ``current_date()`` / ``now()`` → the fixtures' AS_OF literal;
* ``datediff(a, b)`` → ``date_diff('day', CAST(b AS DATE), CAST(a AS DATE))``;
* ``date_add(x, n)`` → ``CAST(x AS DATE) + to_days(n)``;
* ``add_months(x, n)`` → ``CAST(CAST(x AS DATE) + to_months(n) AS DATE)`` (Spark's
  add_months returns DATE, dropping time-of-day);
* ``uuidsha(cols)`` → ``sha1(concat(CAST(c AS VARCHAR)...))`` with sha1 registered as a
  Python UDF that strips non-ascii (≙ utils.py:26-43 ``limpa``; DuckDB has no sha1).
"""

from __future__ import annotations

import hashlib
import os
import re

import duckdb

from alertas_spark.testing.fixtures import AS_OF

D = f"DATE '{AS_OF.isoformat()}'"
TS = f"TIMESTAMP '{AS_OF.isoformat()} 00:00:00'"

_TABLES = {
    "exadata": [
        "mcpr_documento", "mcpr_vista", "mcpr_andamento", "mcpr_sub_andamento",
        "mcpr_tp_andamento", "mcpr_item_movimentacao", "mcpr_movimentacao",
        "mcpr_personagem", "mcpr_pessoa", "mcpr_pessoa_fisica",
        "mcpr_assunto_documento", "mcpr_correlacionamento", "orgi_orgao",
        "mprj_orgao_ext", "gate_info_tecnica",
    ],
    "exadata_aux": [
        "mmps_classe_hierarquia", "mmps_alias", "mmps_tp_andamento",
        "atualizacao_pj_pacote", "tb_penas_assuntos", "tb_pip_cisp",
    ],
    "opengeo": [
        "seg_pub_in_pol_procedimento",
        "plataforma_amb_saneamento_snis_info_indic_agua",
        "plataforma_amb_saneamento_snis_info_indic_esgoto",
        "plataforma_amb_saneamento_snis_info_indic_drenagem",
        "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018",
        "institucional_orgaos_meio_ambiente",
    ],
    "alertas_compras": ["compras_fora_padrao_capital"],
}

_NON_ASCII = re.compile(r"[^\x00-\x7F]")


def _sha1(s: str | None) -> str:
    return hashlib.sha1(_NON_ASCII.sub("", s or "").encode()).hexdigest()


#: ≙ the documentos_ativos base view, jobs.py:202-248 (verbatim logic)
DOCUMENTOS_ATIVOS = """
CREATE VIEW documentos_ativos AS
SELECT DD.*
FROM documento DD
LEFT JOIN (
    SELECT item_docu_dk
    FROM mcpr_item_movimentacao
    JOIN mcpr_movimentacao ON item_movi_dk = movi_dk
    WHERE movi_orga_dk_destino IN (200819, 100500)
) T ON item_docu_dk = DD.docu_dk
LEFT JOIN (
    SELECT vist_docu_dk,
        CASE
        WHEN cod_pct IN (20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33,
                         180, 181, 182, 183)
            AND stao_tppr_dk IN (
                7912, 6548, 6326, 6681, 6678, 6645, 6682, 6680, 6679,
                6644, 6668, 6666, 6665, 6669, 6667, 6664, 6655, 6662,
                6659, 6658, 6663, 6661, 6660, 6657, 6670, 6676, 6674,
                6673, 6677, 6675, 6672, 6018, 6341, 6338, 6019, 6017,
                6591, 6339, 6553, 7871, 6343, 6340, 6342, 6021, 6334,
                6331, 6022, 6020, 6593, 6332, 7872, 6336, 6333, 6335,
                7745, 6346, 6345, 6015, 6016, 6325, 6327, 6328, 6329,
                6330, 6337, 6344, 6656, 6671, 7869, 7870, 6324, 7834,
                7737, 6350, 6251, 6655, 6326)
            THEN 1
        WHEN cod_pct >= 200
            AND stao_tppr_dk IN (
                6682, 6669, 6018, 6341, 6338, 6019, 6017, 6591, 6339,
                7871, 6343, 6340, 6342, 7745, 6346, 7915, 6272, 6253,
                6392, 6377, 6378, 6359, 6362, 6361, 6436, 6524, 7737,
                7811, 6625, 6718, 7834, 6350)
            THEN 1
        ELSE null
        END AS is_arquivamento
    FROM documento
    LEFT JOIN atualizacao_pj_pacote ON id_orgao = docu_orgi_orga_dk_responsavel
    JOIN vista ON vist_docu_dk = docu_dk
    JOIN mcpr_andamento ON vist_dk = pcao_vist_dk
    JOIN mcpr_sub_andamento ON stao_pcao_dk = pcao_dk
    JOIN mcpr_tp_andamento ON tppr_dk = stao_tppr_dk
) A ON A.vist_docu_dk = DD.docu_dk AND is_arquivamento IS NOT NULL
WHERE A.vist_docu_dk IS NULL
AND T.item_docu_dk IS NULL
AND DD.docu_fsdc_dk = 1
AND DD.docu_tpst_dk != 11
"""


def connect(warehouse: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.create_function("sha1", _sha1, ["VARCHAR"], "VARCHAR")
    for schema, tables in _TABLES.items():
        for t in tables:
            path = os.path.join(warehouse, schema, f"{t}.parquet")
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    con.sql("CREATE VIEW documento AS SELECT * FROM mcpr_documento")
    con.sql("CREATE VIEW vista AS SELECT * FROM mcpr_vista")
    con.sql(DOCUMENTOS_ATIVOS)
    return con


def _deadline_inner(cldc_pred: str, tppr_list: str, extra_excl: str = "",
                    extra_cols: str = "", tpst_filter: str = "AND docu_tpst_dk != 3",
                    grupo_join: str = "", grupo_pred: str = "") -> str:
    """Shared inner SELECT of the deadline family (ic1a:44-62 et al.)."""
    return f"""
    SELECT docu_dk, docu_nr_mp, docu_dt_cadastro, docu_orgi_orga_dk_responsavel,
           pcao_dt_andamento, stao_dk, stao_tppr_dk {extra_cols}
    FROM documentos_ativos
    LEFT JOIN (SELECT * FROM mcpr_correlacionamento WHERE corr_tpco_dk IN (2, 6)) C
        ON C.corr_docu_dk2 = docu_dk
    {grupo_join}
    LEFT JOIN (
        SELECT vist_docu_dk, pcao_dt_andamento, stao_dk, stao_tppr_dk
        FROM vista
        JOIN mcpr_andamento ON pcao_vist_dk = vist_dk
        JOIN mcpr_sub_andamento ON stao_pcao_dk = pcao_dk
        WHERE pcao_dt_cancelamento IS NULL
        AND stao_tppr_dk IN ({tppr_list})
    ) T ON T.vist_docu_dk = docu_dk
    WHERE {cldc_pred} {tpst_filter} AND corr_tpco_dk IS NULL {grupo_pred} {extra_excl}
    """


def _tj_oracle(classe_pred: str, deadline: int) -> str:
    """DCTJ/DNTJ (alerta_dctj.py:20-62 / alerta_dntj.py:20-60)."""
    return f"""
    WITH sent AS (
        SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel,
               MAX(m.movi_dt_recebimento_guia) AS movi_dt_guia
        FROM documento d
        JOIN mmps_classe_hierarquia c ON d.docu_cldc_dk = c.cldc_dk
        JOIN mcpr_personagem p ON d.docu_dk = p.pers_docu_dk AND p.pers_tppe_dk = 7
        JOIN mcpr_pessoa pe ON p.pers_pess_dk = pe.pess_dk
        JOIN mmps_alias al ON pe.pess_nm_pessoa = al.alias
        JOIN mcpr_item_movimentacao i ON d.docu_dk = i.item_docu_dk
        JOIN mcpr_movimentacao m ON i.item_movi_dk = m.movi_dk
        JOIN orgi_orgao oi ON m.movi_orga_dk_origem = oi.orgi_dk AND oi.orgi_tpor_dk = 1
        JOIN mprj_orgao_ext oe ON m.movi_orga_dk_destino = oe.orge_orga_dk
             AND oe.orge_tpoe_dk IN (63, 64, 65, 66, 67, 69, 70, 83)
        WHERE d.docu_fsdc_dk = 1 AND {classe_pred}
        GROUP BY d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    ),
    unreturned AS (
        SELECT s.* FROM sent s
        LEFT JOIN mcpr_item_movimentacao i ON s.docu_dk = i.item_docu_dk
        LEFT JOIN mcpr_movimentacao m ON i.item_movi_dk = m.movi_dk
            AND s.docu_orgi_orga_dk_responsavel = m.movi_orga_dk_destino
            AND s.movi_dt_guia < m.movi_dt_recebimento_guia
        GROUP BY ALL
        HAVING MAX(m.movi_dk) IS NULL
    )
    SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
        CAST(CAST(movi_dt_guia AS DATE) + to_days({deadline}) AS TIMESTAMP)
            AS alrt_date_referencia,
        docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
        CAST(date_diff('day', CAST(movi_dt_guia AS DATE) + to_days({deadline}), {D})
             AS INTEGER) AS alrt_dias_referencia
    FROM unreturned
    WHERE date_diff('day', CAST(movi_dt_guia AS DATE) + to_days({deadline}), {D}) > 0
    """


ORACLES: dict[str, str] = {}

ORACLES["VADF"] = f"""
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    CAST(vist_orgi_orga_dk AS INTEGER) AS alrt_orgi_orga_dk,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(vist_dk AS VARCHAR))) AS alrt_key,
    vist_dk AS alrt_dk_referencia
FROM documento JOIN vista ON vist_docu_dk = docu_dk
WHERE docu_fsdc_dk != 1 AND docu_tpst_dk != 11 AND vist_dt_fechamento_vista IS NULL
"""

ORACLES["GATE"] = f"""
WITH last_vista AS (
    SELECT vist_docu_dk, MAX(vist_dt_abertura_vista) AS dt_max_vista
    FROM vista GROUP BY vist_docu_dk
)
SELECT itcn_dk AS alrt_dk_referencia, docu_dk AS alrt_docu_dk,
    docu_nr_mp AS alrt_docu_nr_mp, itcn_dt_cadastro AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', CAST(itcn_dt_cadastro AS DATE), {D}) AS INTEGER)
        AS alrt_dias_referencia,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(itcn_dk AS VARCHAR))) AS alrt_key
FROM documento
LEFT JOIN mmps_classe_hierarquia ON docu_cldc_dk = cldc_dk
JOIN gate_info_tecnica ON docu_dk = itcn_docu_dk
LEFT JOIN last_vista ON docu_dk = vist_docu_dk
WHERE dt_max_vista IS NULL OR itcn_dt_cadastro > dt_max_vista
"""

ORACLES["OUVI"] = """
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    movi_orga_dk_destino AS alrt_orgi_orga_dk,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(item_dk AS VARCHAR))) AS alrt_key,
    item_dk AS alrt_dk_referencia
FROM documento
LEFT JOIN mmps_classe_hierarquia ON docu_cldc_dk = cldc_dk
JOIN mcpr_item_movimentacao ON docu_dk = item_docu_dk
JOIN mcpr_movimentacao ON item_movi_dk = movi_dk
WHERE docu_tpdc_dk = 119 AND docu_tpst_dk != 11
AND item_in_recebimento IS NULL AND movi_tpgu_dk = 2
AND movi_dt_recebimento_guia IS NULL
"""

ORACLES["DORD"] = """
WITH doc_and AS (
    SELECT docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel, docu_tpst_dk,
           docu_fsdc_dk, vist_orgi_orga_dk, pcao_dt_andamento
    FROM documento
    LEFT JOIN mmps_classe_hierarquia ON docu_cldc_dk = cldc_dk
    JOIN vista ON vist_docu_dk = docu_dk
    JOIN mcpr_andamento ON vist_dk = pcao_vist_dk AND pcao_tpsa_dk = 2
),
last AS (
    SELECT docu_dk AS land_docu_dk, MAX(pcao_dt_andamento) AS last_date
    FROM doc_and GROUP BY docu_dk
)
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    pcao_dt_andamento AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk
FROM doc_and
JOIN last ON docu_dk = land_docu_dk AND pcao_dt_andamento = last_date
WHERE docu_tpst_dk != 11 AND docu_fsdc_dk = 1
AND vist_orgi_orga_dk != docu_orgi_orga_dk_responsavel
"""

ORACLES["OFFP"] = f"""
SELECT DISTINCT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    CAST(CAST(pcao_dt_andamento AS DATE) + to_days(365) AS TIMESTAMP)
        AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', CAST(pcao_dt_andamento AS DATE) + to_days(365), {D})
         AS INTEGER) AS alrt_dias_referencia,
    CAST(date_diff('day', CAST(pcao_dt_andamento AS DATE) + to_days(365), {D})
         AS INTEGER) AS alrt_dias_passados,
    sha1(concat(CAST(docu_dk AS VARCHAR),
                CAST(CAST(CAST(pcao_dt_andamento AS DATE) + to_days(365) AS TIMESTAMP)
                     AS VARCHAR))) AS alrt_key
FROM documento
LEFT JOIN mmps_classe_hierarquia ON docu_cldc_dk = cldc_dk
JOIN vista ON docu_dk = vist_docu_dk
JOIN mcpr_andamento ON vist_dk = pcao_vist_dk AND pcao_dt_cancelamento IS NULL
JOIN mcpr_sub_andamento ON pcao_dk = stao_pcao_dk AND stao_tppr_dk = 6497
WHERE docu_tpst_dk != 11 AND docu_fsdc_dk = 1
AND date_diff('day', CAST(pcao_dt_andamento AS DATE) + to_days(365), {D}) > 0
"""

ORACLES["BDPA"] = f"""
WITH base AS (
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel,
           oe.orge_nm_orgao AS nm_delegacia, v.vist_dk, a.pcao_dk, a.pcao_dt_andamento
    FROM documento d
    LEFT JOIN mprj_orgao_ext oe ON d.docu_orge_orga_dk_deleg_origem = oe.orge_orga_dk
    LEFT JOIN mmps_classe_hierarquia c ON d.docu_cldc_dk = c.cldc_dk
    JOIN vista v ON d.docu_dk = v.vist_docu_dk
    JOIN mcpr_andamento a ON v.vist_dk = a.pcao_vist_dk
         AND a.pcao_dt_andamento >= TIMESTAMP '2013-01-01'
    WHERE d.docu_tpst_dk = 3 AND d.docu_fsdc_dk = 1
),
last_and AS (SELECT docu_dk, MAX(pcao_dt_andamento) AS dt_last FROM base GROUP BY docu_dk),
doc_baixa AS (
    SELECT b.*, s.stao_nr_dias_prazo
    FROM base b
    JOIN last_and l ON b.docu_dk = l.docu_dk AND b.pcao_dt_andamento = l.dt_last
    JOIN mcpr_sub_andamento s ON b.pcao_dk = s.stao_pcao_dk
    JOIN mmps_tp_andamento t ON s.stao_tppr_dk = t.id
         AND t.id IN (6006, 6010, 6363, 6494, 6495, 6519, 6520, 6521, 6522, 6523)
    WHERE s.stao_nr_dias_prazo IS NOT NULL
),
doc_mov AS (
    SELECT db.*, m.movi_orga_dk_destino,
        coalesce(m.movi_dt_recebimento_guia, m.movi_dt_envio_guia,
                 m.movi_dt_criacao_guia) AS movi_dt_guia
    FROM doc_baixa db
    JOIN mcpr_item_movimentacao i ON db.docu_dk = i.item_docu_dk
    JOIN mcpr_movimentacao m ON i.item_movi_dk = m.movi_dk
),
last_mov AS (SELECT docu_dk, MAX(movi_dt_guia) AS dt_guia FROM doc_mov GROUP BY docu_dk),
final AS (
    SELECT dm.*, CAST(CAST(lm.dt_guia AS DATE)
               + to_days(CAST(dm.stao_nr_dias_prazo AS INTEGER)) AS DATE) AS dt_fim_prazo
    FROM doc_mov dm
    JOIN last_mov lm ON dm.docu_dk = lm.docu_dk AND dm.movi_dt_guia = lm.dt_guia
    JOIN mprj_orgao_ext p ON dm.movi_orga_dk_destino = p.orge_orga_dk
         AND p.orge_tpoe_dk IN (60, 61, 68)
)
SELECT DISTINCT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    CAST(dt_fim_prazo AS TIMESTAMP) AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', dt_fim_prazo, {D}) AS INTEGER) AS alrt_dias_referencia,
    nm_delegacia AS alrt_info_adicional,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(dt_fim_prazo AS VARCHAR))) AS alrt_key
FROM final
WHERE date_diff('day', dt_fim_prazo, {D}) > 0
"""

ORACLES["DCTJ"] = _tj_oracle("cldc_ds_hierarquia LIKE 'PROCESSO CRIMINAL%'", 60)
ORACLES["DNTJ"] = _tj_oracle("cldc_ds_hierarquia NOT LIKE 'PROCESSO CRIMINAL%'", 120)

ORACLES["IC1A"] = f"""
WITH inner_rows AS ({_deadline_inner(
    "docu_cldc_dk = 392", "6291, 6511, 6012, 6002",
    grupo_join=("LEFT JOIN (SELECT * FROM orgi_orgao WHERE orgi_nm_orgao LIKE "
                "'%GRUPO DE ATUAÇÃO%') O ON O.orgi_dk = docu_orgi_orga_dk_carga"),
    grupo_pred="AND orgi_dk IS NULL")}),
grouped AS (
    SELECT docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel,
        COALESCE(MAX(pcao_dt_andamento), docu_dt_cadastro) AS dt_inicio,
        MAX(stao_dk) AS stao_dk
    FROM inner_rows
    GROUP BY docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel, docu_dt_cadastro
)
SELECT g.docu_dk AS alrt_docu_dk, g.docu_nr_mp AS alrt_docu_nr_mp,
    CAST(CAST(dt_inicio AS DATE) + to_days(365) AS TIMESTAMP) AS alrt_date_referencia,
    g.docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', CAST(dt_inicio AS DATE), {D}) - 365 AS INTEGER)
        AS alrt_dias_referencia,
    g.stao_dk AS alrt_dk_referencia,
    COALESCE(hierarquia, 'Cadastro do Procedimento no Sistema') AS alrt_info_adicional,
    sha1(concat(CAST(g.docu_dk AS VARCHAR),
                CAST(CAST(CAST(dt_inicio AS DATE) + to_days(365) AS TIMESTAMP)
                     AS VARCHAR))) AS alrt_key
FROM grouped g
LEFT JOIN mcpr_sub_andamento s ON g.stao_dk = s.stao_dk
LEFT JOIN mmps_tp_andamento ON s.stao_tppr_dk = id
WHERE date_diff('day', CAST(dt_inicio AS DATE), {D}) > 365
"""

ORACLES["PA1A"] = f"""
WITH inner_rows AS ({_deadline_inner(
    "docu_cldc_dk IN (51219, 51220, 51221, 51222, 51223)", "6291, 6013")}),
grouped AS (
    SELECT docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel,
        COALESCE(MAX(pcao_dt_andamento), docu_dt_cadastro) AS dt_inicio
    FROM inner_rows
    GROUP BY docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel, docu_dt_cadastro
)
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    CAST(CAST(dt_inicio AS DATE) + to_days(365) AS TIMESTAMP) AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', CAST(dt_inicio AS DATE), {D}) - 365 AS INTEGER)
        AS alrt_dias_referencia,
    sha1(concat(CAST(docu_dk AS VARCHAR),
                CAST(CAST(CAST(dt_inicio AS DATE) + to_days(365) AS TIMESTAMP)
                     AS VARCHAR))) AS alrt_key
FROM grouped
WHERE date_diff('day', CAST(dt_inicio AS DATE), {D}) > 365
"""

ORACLES["PPFP"] = f"""
WITH inner_rows AS ({_deadline_inner("docu_cldc_dk = 395", "6291, 6011")}),
grouped AS (
    SELECT docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel,
        COALESCE(MAX(CASE WHEN stao_tppr_dk = 6011 THEN pcao_dt_andamento END),
                 docu_dt_cadastro) AS dt_inicio,
        MAX(CASE WHEN stao_tppr_dk = 6291 THEN 180 ELSE 90 END) AS nr_dias_prazo
    FROM inner_rows
    GROUP BY docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel, docu_dt_cadastro
),
windowed AS (
    SELECT *, date_diff('day', CAST(dt_inicio AS DATE), {D}) AS elapsed0,
        CAST(CAST(dt_inicio AS DATE) + to_days(nr_dias_prazo) AS TIMESTAMP)
            AS dt_fim_prazo
    FROM grouped
    WHERE date_diff('day', CAST(dt_inicio AS DATE), {D}) > nr_dias_prazo - 20
)
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    dt_fim_prazo AS alrt_date_referencia,
    CAST(abs(elapsed0 - nr_dias_prazo) AS INTEGER) AS alrt_dias_referencia,
    CASE WHEN elapsed0 > nr_dias_prazo THEN 'PPFP' ELSE 'PPPV' END AS alrt_sigla,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(dt_fim_prazo AS VARCHAR))) AS alrt_key
FROM windowed
"""

ORACLES["NF30"] = f"""
WITH inner_rows AS ({_deadline_inner(
    "docu_cldc_dk = 393",
    "6011, 6012, 6013, 6014, 6251, 6252, 6253, 6259, 6260, 6516, 6533, 6556, 6567, "
    "6628, 6291, 7282, 7283, 6034, 6631, 7751, 7752, 6035, 7754, 7753, 6007, 6632",
    tpst_filter="")}),
grouped AS (
    SELECT docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel,
        COALESCE(MAX(CASE WHEN stao_tppr_dk IN (6034, 6631, 7751, 7752, 6035, 7754,
                                                7753, 6007, 6632)
                          THEN pcao_dt_andamento END), docu_dt_cadastro) AS dt_inicio,
        MAX(CASE WHEN stao_tppr_dk IN (6291, 7282, 7283) THEN 120 ELSE 30 END)
            AS nr_dias_prazo
    FROM inner_rows
    GROUP BY docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel, docu_dt_cadastro
    HAVING MAX(CASE WHEN stao_tppr_dk IN (6011, 6012, 6013, 6014, 6251, 6252, 6253,
                                          6259, 6260, 6516, 6533, 6556, 6567, 6628)
                    THEN 1 ELSE 0 END) = 0
)
SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    dt_inicio AS alrt_date_referencia,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    CAST(date_diff('day', CAST(dt_inicio AS DATE), {D}) AS INTEGER)
        AS alrt_dias_referencia,
    sha1(concat(CAST(docu_dk AS VARCHAR), CAST(dt_inicio AS VARCHAR))) AS alrt_key,
    CASE WHEN date_diff('day', CAST(dt_inicio AS DATE), {D}) > 120
         THEN 'NF120' ELSE 'NF30' END AS alrt_sigla
FROM grouped
WHERE date_diff('day', CAST(dt_inicio AS DATE), {D}) > nr_dias_prazo
"""

ORACLES["MVVD"] = f"""
WITH pessoa_vitima AS (
    SELECT * FROM mcpr_pessoa_fisica
    JOIN (SELECT * FROM mcpr_personagem WHERE pers_tppe_dk IN (3, 290)) pv
        ON pesf_pess_dk = pers_pess_dk
),
vitimas_passadas AS (
    SELECT pesf_pess_dk AS vict_pess_dk, pesf_cpf AS vict_cpf, pesf_nr_rg AS vict_rg,
        pesf_nm_pessoa_fisica AS vict_nome, pesf_nm_mae AS vict_mae,
        pesf_dt_nasc AS vict_nasc, docu_dk AS vict_docu_dk
    FROM pessoa_vitima
    JOIN (SELECT * FROM documento WHERE docu_mate_dk = 43) d
        ON pers_docu_dk = docu_dk
),
doc_vitima AS (
    SELECT pv.*, d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM pessoa_vitima pv
    JOIN (SELECT * FROM documento
          WHERE date_diff('day', CAST(docu_dt_cadastro AS DATE), {D}) <= 30
          AND docu_mate_dk = 43) d
        ON pv.pers_docu_dk = d.docu_dk
    LEFT JOIN mmps_classe_hierarquia c ON d.docu_cldc_dk = c.cldc_dk
),
matched AS (
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM doc_vitima d JOIN vitimas_passadas v
        ON d.pesf_pess_dk = v.vict_pess_dk AND v.vict_docu_dk != d.docu_dk
    UNION ALL
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM doc_vitima d JOIN vitimas_passadas v
        ON d.pesf_cpf = v.vict_cpf AND v.vict_docu_dk != d.docu_dk
    WHERE d.pesf_cpf != '00000000000'
    UNION ALL
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM doc_vitima d JOIN vitimas_passadas v
        ON d.pesf_nr_rg = v.vict_rg AND v.vict_docu_dk != d.docu_dk
    UNION ALL
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM doc_vitima d JOIN vitimas_passadas v
        ON d.pesf_nm_pessoa_fisica = v.vict_nome AND d.pesf_nm_mae = v.vict_mae
        AND v.vict_docu_dk != d.docu_dk
    UNION ALL
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel
    FROM doc_vitima d JOIN vitimas_passadas v
        ON d.pesf_nm_pessoa_fisica = v.vict_nome AND d.pesf_dt_nasc = v.vict_nasc
        AND v.vict_docu_dk != d.docu_dk
)
SELECT DISTINCT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
    docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    sha1(CAST(docu_dk AS VARCHAR)) AS alrt_key
FROM matched
"""

ORACLES["DT2I"] = f"""
WITH doc_andamento AS (
    SELECT d.docu_dk, d.docu_nr_mp, d.docu_orgi_orga_dk_responsavel,
           a.pcao_dk, a.pcao_dt_andamento
    FROM documento d
    LEFT JOIN mmps_classe_hierarquia c ON d.docu_cldc_dk = c.cldc_dk
    JOIN vista v ON v.vist_docu_dk = d.docu_dk
    JOIN mcpr_andamento a ON v.vist_dk = a.pcao_vist_dk
         AND a.pcao_dt_cancelamento IS NULL
),
recente AS (
    SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp, pcao_dt_andamento,
        docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
        CAST(date_diff('day', CAST(pcao_dt_andamento AS DATE), {D}) AS INTEGER)
            AS elapsed
    FROM doc_andamento
    WHERE date_diff('day', CAST(pcao_dt_andamento AS DATE), {D}) <= 7
),
ciencia AS (
    SELECT docu_dk AS cie_docu_dk, pcao_dt_andamento AS cie_dt_mov
    FROM doc_andamento JOIN mcpr_sub_andamento ON pcao_dk = stao_pcao_dk
    WHERE stao_tppr_dk IN (6374, 6375, 6376, 6377, 6378)
),
recurso AS (
    SELECT docu_dk AS rec_docu_dk, pcao_dt_andamento AS rec_dt_mov
    FROM doc_andamento JOIN mcpr_sub_andamento ON pcao_dk = stao_pcao_dk
    WHERE stao_tppr_dk IN (6449, 6451, 6453, 6454, 6455, 6456, 6457, 6458, 6459, 6460,
                           6461, 6462, 6463, 6464, 6465, 6466, 6467, 6468, 6470, 6471,
                           6472, 6473, 6474, 6475, 6476, 6477, 6478, 6479, 6529, 6530,
                           6554, 6555, 7824, 7825, 7850)
),
cie_rec AS (
    SELECT * FROM ciencia JOIN recurso ON cie_docu_dk = rec_docu_dk
    WHERE rec_dt_mov >= cie_dt_mov
)
SELECT alrt_docu_dk, alrt_docu_nr_mp,
    MAX(pcao_dt_andamento) AS alrt_date_referencia,
    alrt_orgi_orga_dk,
    MIN(elapsed) AS alrt_dias_referencia,
    sha1(concat(CAST(alrt_docu_dk AS VARCHAR),
                CAST(MAX(pcao_dt_andamento) AS VARCHAR))) AS alrt_key
FROM cie_rec JOIN recente ON rec_docu_dk = alrt_docu_dk
GROUP BY alrt_docu_dk, alrt_docu_nr_mp, alrt_orgi_orga_dk
"""

ORACLES["RO"] = f"""
WITH ros_que_faltam AS (
    SELECT CAST(substring(proc_numero, 1, 3) AS INTEGER) AS nr_delegacia,
        MAX(proc_numero) AS max_proc,
        CAST(substring(MAX(proc_numero), 5, 5) AS INTEGER)
            - COUNT(DISTINCT proc_numero) AS qt_ros_faltantes
    FROM seg_pub_in_pol_procedimento
    WHERE CAST(substring(proc_numero, 11, 4) AS INTEGER) = {AS_OF.year}
    GROUP BY 1
)
SELECT nr_delegacia AS ro_nr_delegacia, pip_codigo AS alrt_orgi_orga_dk,
    qt_ros_faltantes AS ro_qt_ros_faltantes,
    sha1(concat(CAST(nr_delegacia AS VARCHAR), max_proc)) AS alrt_key,
    max_proc AS ro_max_proc, cisp_nome_apresentacao AS ro_cisp_nome_apresentacao
FROM ros_que_faltam JOIN tb_pip_cisp ON nr_delegacia = cisp_codigo
WHERE qt_ros_faltantes >= 1
"""

ORACLES["FEBT"] = f"""
WITH ultimo AS (
    SELECT CAST(substring(proc_numero, 1, 3) AS INTEGER) AS numero_delegacia,
        date_diff('day', CAST(MAX(data_liberacao) AS DATE), {D}) AS diff_ultimo_envio,
        MAX(data_liberacao) AS ultima_liberacao
    FROM seg_pub_in_pol_procedimento
    GROUP BY 1
)
SELECT CAST(numero_delegacia AS VARCHAR) AS ro_nr_delegacia,
    pip_codigo AS alrt_orgi_orga_dk,
    cisp_nome_apresentacao AS ro_cisp_nome_apresentacao,
    sha1(concat(CAST(numero_delegacia AS VARCHAR), CAST(ultima_liberacao AS VARCHAR)))
        AS alrt_key
FROM ultimo JOIN tb_pip_cisp ON numero_delegacia = cisp_codigo
    AND diff_ultimo_envio > 30
"""

ORACLES["ABR1"] = f"""
SELECT docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
    COUNT(1) AS abr1_nr_procedimentos,
    sha1(concat(CAST({AS_OF.year} AS VARCHAR), CAST({AS_OF.month} AS VARCHAR)))
        AS alrt_key,
    concat(CAST({AS_OF.year} AS VARCHAR), CAST({AS_OF.month} AS VARCHAR)) AS abr1_ano_mes
FROM documentos_ativos
JOIN atualizacao_pj_pacote pac ON pac.id_orgao = docu_orgi_orga_dk_responsavel
    AND UPPER(orgi_nm_orgao) LIKE '%TUTELA%'
WHERE date_diff('day', CAST(docu_dt_cadastro AS DATE), last_day({D})) / 365.2425 > 1
AND docu_dt_cancelamento IS NULL
AND docu_cldc_dk = 392
AND docu_tpst_dk != 3
GROUP BY docu_orgi_orga_dk_responsavel
"""

ORACLES["COMP"] = """
SELECT id_orgao AS alrt_orgi_orga_dk, contratacao AS comp_contratacao,
    item AS comp_item, id_item AS comp_id_item,
    contrato_iditem AS comp_contrato_iditem, dt_contratacao AS comp_dt_contratacao,
    var_perc AS comp_var_perc, sha1(contrato_iditem) AS alrt_key
FROM (SELECT * FROM compras_fora_padrao_capital WHERE var_perc >= 20)
CROSS JOIN (SELECT id_orgao FROM atualizacao_pj_pacote
            WHERE UPPER(pacote_atribuicao) LIKE '%CIDADANIA%'
            AND orgao_codamp LIKE '%CAPITAL%')
"""


def _snis_oracle_family(table: str, cols: list[str], ops: list[str],
                        labels: list[str]) -> str:
    comps = ", ".join(
        f"CASE WHEN A.{c} {op} R.{c} THEN '{lab}' ELSE NULL END AS ind{i + 1}"
        for i, (c, op, lab) in enumerate(zip(cols, ops, labels)))
    unions = " UNION ALL ".join(
        f"SELECT municipio, ind{i + 1} AS indicador FROM indicadores "
        f"WHERE ind{i + 1} IS NOT NULL" for i in range(4))
    collist = ", ".join(cols)
    return f"""
    WITH agregados AS (
        SELECT cod_mun, municipio, {collist}
        FROM {table}
        WHERE ano_referencia = (SELECT MAX(ano_referencia)
                                FROM plataforma_amb_saneamento_snis_info_indic_agua)
        AND cod_prest IS NULL
    ),
    indicadores AS (
        SELECT municipio, {comps}
        FROM agregados A
        JOIN (SELECT cod_mun, {collist} FROM agregados WHERE cod_mun = 33) R
            ON R.cod_mun != A.cod_mun
    )
    {unions}
    """


_ISPS_AGUA = _snis_oracle_family(
    "plataforma_amb_saneamento_snis_info_indic_agua",
    ["in009", "in013", "in023", "in049"], ["<", ">", "<", ">"],
    ["Índice de Hidrometação", "Índice de Perdas de Faturamento",
     "Índice de Atendimento Urbano de Água", "Índice de Perdas na Distribuição"])

_ISPS_ESGOTO = _snis_oracle_family(
    "plataforma_amb_saneamento_snis_info_indic_esgoto",
    ["in015", "in016", "in024", "in046"], ["<", "<", "<", "<"],
    ["Índice de Coleta de Esgoto", "Índice de Tratamento de Esgoto",
     "Índice de Atendimento Urbano de Esgoto Referido",
     "Índice de Esgoto Tratado Referido à Água Consumida"])

_ISPS_DRENAGEM = """
WITH agregados AS (
    SELECT sum(ri013)/sum(ge008) AS in040,
        ((sum(ri029)+sum(ri067))/sum(ge006)) AS in041,
        sum(ie024)/sum(ie017) AS in021,
        sum(ie019)/sum(ie017) AS in020
    FROM meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018
),
indicadores AS (
    SELECT A.municipio,
        CASE WHEN A.in020 < R.in020 THEN 'Taxa de Cobertura de Pavimentação e Meio-Fio na Área Urbana do Município' ELSE NULL END AS ind1,
        CASE WHEN A.in021 > R.in021 THEN 'Taxa de Cobertura de Vias Públicas com Redes ou Canais Pluviais Subterrâneos na Área Urbana' ELSE NULL END AS ind2,
        CASE WHEN A.in040 > R.in040 THEN 'Parcela de Domicílios em Situação de Risco de Inundação' ELSE NULL END AS ind3,
        CASE WHEN A.in041 > R.in041 THEN 'Parcela da População Impactada por Eventos Hidrológicos' ELSE NULL END AS ind4
    FROM plataforma_amb_saneamento_snis_info_indic_drenagem A
    JOIN agregados R ON 1 = 1
    WHERE ano_referencia = (SELECT MAX(ano_referencia)
                            FROM plataforma_amb_saneamento_snis_info_indic_agua)
)
SELECT municipio, ind1 AS indicador FROM indicadores WHERE ind1 IS NOT NULL
UNION ALL
SELECT municipio, ind2 AS indicador FROM indicadores WHERE ind2 IS NOT NULL
UNION ALL
SELECT municipio, ind3 AS indicador FROM indicadores WHERE ind3 IS NOT NULL
UNION ALL
SELECT municipio, ind4 AS indicador FROM indicadores WHERE ind4 IS NOT NULL
"""

ORACLES["ISPS"] = f"""
WITH indicadores_all AS (
    ({_ISPS_AGUA}) UNION ALL ({_ISPS_ESGOTO}) UNION ALL ({_ISPS_DRENAGEM})
)
SELECT P.id_orgao AS alrt_orgi_orga_dk, I.indicador AS isps_indicador,
    I.municipio AS isps_municipio,
    sha1(concat(I.indicador, I.municipio,
                CAST((SELECT MAX(ano_referencia)
                      FROM plataforma_amb_saneamento_snis_info_indic_agua) AS VARCHAR)))
        AS alrt_key,
    CAST((SELECT MAX(ano_referencia)
          FROM plataforma_amb_saneamento_snis_info_indic_agua) AS INTEGER)
        AS isps_ano_referencia
FROM atualizacao_pj_pacote P
JOIN institucional_orgaos_meio_ambiente M ON M.cod_orgao = P.id_orgao
JOIN indicadores_all I ON I.municipio = M.comarca
WHERE cod_pct IN (20, 21, 22, 24, 28, 183)
"""

ORACLES["PRCR"] = f"""
WITH doc_pena AS (
    SELECT docu_dk, docu_nr_mp,
        CASE WHEN docu_dt_fato < docu_dt_cadastro THEN docu_dt_fato
             ELSE docu_dt_cadastro END AS docu_dt_fato,
        docu_orgi_orga_dk_responsavel, id, max_pena, multiplicador, abuso_menor
    FROM documentos_ativos
    LEFT JOIN mmps_classe_hierarquia ON cldc_dk = docu_cldc_dk
    JOIN mcpr_assunto_documento ON docu_dk = asdo_docu_dk
    JOIN tb_penas_assuntos ON id = asdo_assu_dk
    JOIN atualizacao_pj_pacote ON docu_orgi_orga_dk_responsavel = id_orgao
    WHERE docu_dt_cadastro >= TIMESTAMP '2010-01-01'
    AND max_pena IS NOT NULL
    AND cod_pct IN (200, 201, 202, 203, 204, 205, 206, 207, 208, 209)
    AND asdo_dt_fim IS NULL
),
pena_fatores AS (
    -- LN terms quantized to 1e-9-unit bigints: matches the engine's
    -- order-independent product aggregate (see alerts/prescription.py)
    SELECT docu_dk,
           EXP(SUM(CAST(ROUND(LN(max_pena) * 1e9) AS BIGINT)) / 1e9) AS fator_pena
    FROM doc_pena WHERE multiplicador = 1 GROUP BY docu_dk
),
doc_prescricao AS (
    SELECT P.*,
        CASE WHEN fator_pena IS NOT NULL THEN max_pena * fator_pena
             ELSE max_pena END AS max_pena_fatorado
    FROM doc_pena P
    LEFT JOIN pena_fatores F ON F.docu_dk = P.docu_dk
    WHERE multiplicador = 0
),
com_tempo AS (
    SELECT *, CASE
        WHEN max_pena_fatorado < 1 THEN 3
        WHEN max_pena_fatorado < 2 THEN 4
        WHEN max_pena_fatorado < 4 THEN 8
        WHEN max_pena_fatorado < 8 THEN 12
        WHEN max_pena_fatorado < 12 THEN 16
        ELSE 20 END AS tempo_prescricao
    FROM doc_prescricao
),
prescricao_fatores AS (
    SELECT docu_dk,
        CASE WHEN NOT (dt_compare >= dt_21 AND {TS} < dt_70)
             THEN 0.5 ELSE NULL END AS fator_prescricao
    FROM (
        SELECT DISTINCT docu_dk, pesf_pess_dk,
            CAST(CAST(pesf_dt_nasc AS DATE) + to_months(21 * 12) AS DATE) AS dt_21,
            CAST(CAST(pesf_dt_nasc AS DATE) + to_months(70 * 12) AS DATE) AS dt_70,
            docu_dt_fato AS dt_compare
        FROM com_tempo
        JOIN mcpr_personagem ON pers_docu_dk = docu_dk
        JOIN mcpr_pessoa_fisica ON pers_pesf_dk = pesf_pess_dk
        WHERE pers_tppe_dk IN (290, 7, 21, 317, 20, 14, 32, 345, 40, 5, 24)
        AND pesf_nm_pessoa_fisica != 'MP'
    ) t
),
fatorado AS (
    SELECT P.*,
        CASE WHEN fator_prescricao IS NOT NULL
             THEN tempo_prescricao * fator_prescricao
             ELSE tempo_prescricao END AS tempo_prescricao_fatorado
    FROM com_tempo P
    LEFT JOIN prescricao_fatores F ON F.docu_dk = P.docu_dk
),
docs_anpp AS (
    SELECT vist_docu_dk, pcao_dt_andamento
    FROM vista
    JOIN mcpr_andamento ON vist_dk = pcao_vist_dk
    JOIN mcpr_sub_andamento ON stao_pcao_dk = pcao_dk
    WHERE stao_tppr_dk = 7920 AND year_month >= 201901
),
docs_abuso_menor AS (
    SELECT docu_dk, MAX(dt_18_anos) AS dt_18_anos
    FROM (
        SELECT P.docu_dk,
            CASE WHEN dt_18_anos > docu_dt_fato THEN dt_18_anos ELSE NULL END
                AS dt_18_anos
        FROM fatorado P
        JOIN mcpr_personagem ON pers_docu_dk = P.docu_dk
        JOIN (SELECT pesf_pess_dk,
                  CAST(CAST(CAST(pesf_dt_nasc AS DATE) + to_months(18 * 12) AS DATE)
                       AS TIMESTAMP) AS dt_18_anos
              FROM mcpr_pessoa_fisica) t ON pers_pesf_dk = pesf_pess_dk
        WHERE abuso_menor = 1
        AND pers_tppe_dk IN (3, 13, 18, 6, 248, 290)
    ) t2
    GROUP BY docu_dk
),
tempo AS (
    SELECT P.*,
        CAST(CAST(CAST((CASE
            WHEN M.dt_18_anos IS NOT NULL AND abuso_menor = 1 THEN M.dt_18_anos
            WHEN A.pcao_dt_andamento IS NOT NULL THEN A.pcao_dt_andamento
            ELSE docu_dt_fato END) AS DATE)
            + to_months(CAST(tempo_prescricao_fatorado * 12 AS INTEGER)) AS DATE)
            AS TIMESTAMP) AS data_prescricao
    FROM fatorado P
    LEFT JOIN docs_anpp A ON A.vist_docu_dk = P.docu_dk
    LEFT JOIN docs_abuso_menor M ON M.docu_dk = P.docu_dk
),
status AS (
    SELECT *,
        date_diff('day', CAST(data_prescricao AS DATE), {D}) AS elapsed,
        CASE WHEN date_diff('day', CAST(data_prescricao AS DATE), {D}) > 0 THEN 2
             WHEN date_diff('day', CAST(data_prescricao AS DATE), {D}) <= -90 THEN 0
             ELSE 1 END AS status_prescricao
    FROM tempo
),
grouped AS (
    SELECT docu_dk AS alrt_docu_dk, docu_nr_mp AS alrt_docu_nr_mp,
        docu_orgi_orga_dk_responsavel AS alrt_orgi_orga_dk,
        MIN(status_prescricao) AS min_status, MAX(status_prescricao) AS max_status,
        CAST(MIN(elapsed) AS INTEGER) AS alrt_dias_referencia
    FROM status
    GROUP BY docu_dk, docu_nr_mp, docu_orgi_orga_dk_responsavel
)
SELECT alrt_docu_dk, alrt_docu_nr_mp, alrt_orgi_orga_dk, alrt_dias_referencia,
    CASE WHEN min_status = 2 THEN 'PRCR1'
         WHEN min_status = 1 THEN 'PRCR2'
         WHEN max_status = 2 THEN 'PRCR3'
         WHEN max_status = 1 THEN 'PRCR4'
         ELSE NULL END AS alrt_sigla,
    sha1(CAST(alrt_docu_dk AS VARCHAR)) AS alrt_key
FROM grouped
WHERE min_status = 2 OR min_status = 1 OR max_status = 2 OR max_status = 1
"""


# ---------------------------------------------------------------------------
# Driver-facing oracle SQL: self-contained (read_parquet CTEs, no registered
# views), without sha1 keys (the driver's DuckDB has no sha1 function — keys are
# pinned by tests/test_alert_oracles.py instead).
# ---------------------------------------------------------------------------

def strip_key(sql: str) -> str:
    """Remove every ``sha1(<balanced>) AS alrt_key`` select item."""
    out = sql
    while True:
        i = out.find("sha1(")
        if i < 0:
            break
        depth, j = 0, i + 4
        while j < len(out):
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        rest = out[j + 1:]
        alias = re.match(r"\s*AS\s+alrt_key", rest)
        end = j + 1 + (alias.end() if alias else 0)
        out = out[:i] + out[end:]
    # heal the select list around the removed item
    out = re.sub(r",\s*,", ", ", out)
    out = re.sub(r"SELECT\s+DISTINCT\s*,", "SELECT DISTINCT ", out)
    out = re.sub(r"SELECT\s*,", "SELECT ", out)
    out = re.sub(r",\s*FROM\b", " FROM", out)
    return out


#: oracles whose output has a timestamp column that must compare as an ISO string
_TS_COL = "alrt_date_referencia"


def driver_sql(warehouse: str, sigla: str) -> str:
    """Self-contained DuckDB SQL for the driver correctness gate: every fixture table
    becomes a read_parquet CTE, ``documentos_ativos`` is inlined, the sha1 key is
    stripped, and timestamp outputs are serialized to ISO strings."""
    ctes = []
    for schema, tables in _TABLES.items():
        for t in tables:
            path = os.path.join(warehouse, schema, f"{t}.parquet")
            ctes.append(f"{t} AS (SELECT * FROM read_parquet('{path}'))")
    ctes.append("documento AS (SELECT * FROM mcpr_documento)")
    ctes.append("vista AS (SELECT * FROM mcpr_vista)")
    ativos_body = DOCUMENTOS_ATIVOS.split("AS", 1)[1]
    ctes.append(f"documentos_ativos AS ({ativos_body})")

    body = strip_key(ORACLES[sigla]).strip()
    if body.upper().startswith("WITH"):
        merged = "WITH " + ",\n".join(ctes) + ",\n" + body[4:]
    else:
        merged = "WITH " + ",\n".join(ctes) + "\n" + body
    has_ts = _TS_COL in body
    if has_ts:
        return (f"SELECT * REPLACE (CAST({_TS_COL} AS VARCHAR) AS {_TS_COL}) "
                f"FROM (\n{merged}\n) _final")
    return merged
