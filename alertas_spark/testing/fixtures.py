"""Deterministic synthetic MPRJ-domain fixtures (FIXTURES.md).

Generates every input table the 20-alert registry reads, as parquet under
``<warehouse>/<schema>/<table>.parquet`` — the layout ``AlertContext`` binds to.
Seeded (RandomState(42)) and generated *relative to AS_OF* so date-window alerts are
reproducible (FIXTURES.md "Determinism requirements").  Random bulk rows exercise the
joins; planted rows guarantee every alert has a non-empty trigger domain.

Pure pandas/pyarrow — no Spark needed to build fixtures.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd

#: injected "today" for all fixture-relative dates — April so ABR1 fires (abr1:24-39)
AS_OF = dt.date(2024, 4, 15)

#: bump when generation logic changes — consumers regenerate on mismatch
VERSION = "mprj-fixtures-v4"

ARCHIVE_ORGS = (200819, 100500)

_TUTELA_PCT = list(range(20, 34)) + [180, 181, 182, 183]
_PIP_PCT = list(range(200, 210))

_MUNICIPIOS = [
    "Angra dos Reis", "Araruama", "Barra Mansa", "Belford Roxo", "Cabo Frio",
    "Campos dos Goytacazes", "Duque de Caxias", "Itaboraí", "Itaguaí", "Macaé",
    "Magé", "Maricá", "Mesquita", "Nilópolis", "Niterói", "Nova Friburgo",
    "Nova Iguaçu", "Petrópolis", "Queimados", "Resende", "Rio das Ostras",
    "São Gonçalo", "São João de Meriti", "Saquarema", "Teresópolis", "Volta Redonda",
]

_CRIMES = [
    ("Homicídio", 20.0, 0, 0), ("Roubo", 10.0, 0, 0), ("Furto", 4.0, 0, 0),
    ("Estelionato", 5.0, 0, 0), ("Lesão corporal", 1.0, 0, 0),
    ("Ameaça", 0.5, 0, 0), ("Tráfico", 15.0, 0, 0), ("Receptação", 3.0, 0, 0),
    ("Estupro de vulnerável", 20.0, 0, 1), ("Abuso sexual infantil", 12.0, 0, 1),
    ("Concurso de crimes", 1.5, 1, 0), ("Crime continuado", 2.0, 1, 0),
    ("Injúria", 0.8, 0, 0), ("Dano", 0.9, 0, 0), ("Apropriação indébita", 6.0, 0, 0),
    ("Peculato", 11.0, 0, 0), ("Corrupção passiva", 11.5, 0, 0),
    ("Falsidade ideológica", 7.0, 0, 0), ("Sem pena", None, 0, 0),
]


def _ts(days_before_as_of) -> pd.Series:
    base = pd.Timestamp(AS_OF)
    return pd.Series(
        base - pd.to_timedelta(np.asarray(days_before_as_of, dtype="int64"), unit="D"))


def _write(warehouse: str, schema: str, name: str, df: pd.DataFrame) -> None:
    path = os.path.join(warehouse, schema, f"{name}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # Spark cannot read TIMESTAMP(NANOS) parquet — force microseconds
    df.to_parquet(path, index=False, coerce_timestamps="us",
                  allow_truncated_timestamps=True)


def generate(warehouse: str) -> None:  # noqa: C901 — one deterministic script
    rs = np.random.RandomState(42)

    # ---- órgãos -------------------------------------------------------------
    org_ids = np.arange(1000, 1200)  # 200 internal órgãos
    pct_pool = _TUTELA_PCT + _PIP_PCT + [100, 101, 102]
    cod_pct = rs.choice(pct_pool, len(org_ids))
    nm_orgao = np.array([
        (f"PROMOTORIA DE JUSTIÇA DE TUTELA COLETIVA {i}" if cp in _TUTELA_PCT
         else f"PROMOTORIA DE INVESTIGAÇÃO PENAL {i}" if cp in _PIP_PCT
         else f"PROMOTORIA DE JUSTIÇA {i}")
        for i, cp in zip(org_ids, cod_pct)
    ])
    pacote = pd.DataFrame({
        "id_orgao": org_ids.astype("int64"),
        "cod_pct": pd.array(cod_pct, dtype="int64"),
        "orgi_nm_orgao": nm_orgao,
        "pacote_atribuicao": np.where(rs.rand(len(org_ids)) < 0.2,
                                      "CIDADANIA E DIREITOS HUMANOS", "CRIMINAL"),
        "orgao_codamp": np.where(rs.rand(len(org_ids)) < 0.3,
                                 "PJ CAPITAL", "PJ INTERIOR"),
    })
    _write(warehouse, "exadata_aux", "atualizacao_pj_pacote", pacote)

    orgi = pd.DataFrame({
        "orgi_dk": org_ids.astype("int64"),
        "orgi_nm_orgao": np.where(rs.rand(len(org_ids)) < 0.05,
                                  "GRUPO DE ATUAÇÃO ESPECIALIZADA", nm_orgao),
        "orgi_tpor_dk": pd.array(np.where(rs.rand(len(org_ids)) < 0.9, 1, 2),
                                 dtype="int64"),
    })
    _write(warehouse, "exadata", "orgi_orgao", orgi)

    ext_ids = np.arange(5000, 5100)
    ext_tp = rs.choice([60, 61, 68, 63, 64, 65, 66, 67, 69, 70, 83, 90, 91], len(ext_ids))
    _write(warehouse, "exadata", "mprj_orgao_ext", pd.DataFrame({
        "orge_orga_dk": ext_ids.astype("int64"),
        "orge_nm_orgao": [f"{'DELEGACIA' if t in (60, 61, 68) else 'TRIBUNAL' if t in (63, 64, 65, 66, 67, 69, 70, 83) else 'ORGAO'} EXT {i}"
                          for i, t in zip(ext_ids, ext_tp)],
        "orge_tpoe_dk": ext_tp.astype("int64"),
    }))
    police_ids = ext_ids[np.isin(ext_tp, (60, 61, 68))]
    court_ids = ext_ids[np.isin(ext_tp, (63, 64, 65, 66, 67, 69, 70, 83))]

    # ---- classes ------------------------------------------------------------
    classes = [392, 393, 395, 51219, 51220, 51221, 51222, 51223,
               20001, 20002, 20003, 30001, 30002]
    _write(warehouse, "exadata_aux", "mmps_classe_hierarquia", pd.DataFrame({
        "cldc_dk": pd.array(classes, dtype="int64"),
        "cldc_ds_classe": [f"CLASSE {c}" for c in classes],
        "cldc_ds_hierarquia": [
            "PROCESSO CRIMINAL > AÇÃO PENAL" if c in (20001, 20002, 20003)
            else "PROCESSO CÍVEL E DO TRABALHO > OUTROS" for c in classes],
    }))

    # ---- documento ----------------------------------------------------------
    n_doc = 6000
    docu_dk = np.arange(1, n_doc + 1)
    cadastro_days = rs.randint(0, 5200, n_doc)          # up to ~14 years back
    cadastro = _ts(cadastro_days)
    fato_offset = rs.randint(0, 700, n_doc)
    fato = cadastro - pd.to_timedelta(fato_offset, unit="D")
    fato = fato.where(rs.rand(n_doc) > 0.15)            # 15% NULL fato
    late_fato = rs.rand(n_doc) < 0.05                   # 5% fato AFTER cadastro
    fato = fato.mask(late_fato, cadastro + pd.to_timedelta(30, unit="D"))
    documento = pd.DataFrame({
        "docu_dk": docu_dk.astype("int64"),
        "docu_nr_mp": [f"MPRJ {d:08d}" for d in docu_dk],
        "docu_nr_externo": [f"EXT{d:08d}" for d in docu_dk],
        "docu_tx_etiqueta": [f"ETIQ-{d}" for d in docu_dk],
        "docu_dt_cadastro": cadastro,
        "docu_dt_fato": fato,
        "docu_dt_cancelamento": _ts(rs.randint(1, 400, n_doc)).where(
            rs.rand(n_doc) < 0.03),
        "docu_cldc_dk": pd.array(rs.choice(classes, n_doc), dtype="int64"),
        "docu_orgi_orga_dk_responsavel": pd.array(rs.choice(org_ids, n_doc),
                                                  dtype="int64"),
        "docu_orgi_orga_dk_carga": pd.array(rs.choice(org_ids, n_doc), dtype="int64"),
        "docu_orge_orga_dk_deleg_origem": pd.array(rs.choice(ext_ids, n_doc),
                                                   dtype="int64"),
        "docu_fsdc_dk": pd.array(np.where(rs.rand(n_doc) < 0.85, 1, 2), dtype="int64"),
        "docu_tpst_dk": pd.array(rs.choice([1, 2, 3, 11], n_doc,
                                           p=[0.6, 0.2, 0.12, 0.08]), dtype="int64"),
        "docu_tpdc_dk": pd.array(np.where(rs.rand(n_doc) < 0.05, 119, 1),
                                 dtype="int64"),
        "docu_mate_dk": pd.array(np.where(rs.rand(n_doc) < 0.12, 43, 10),
                                 dtype="int64"),
    })
    # planted: recent DV docs (MVVD) — registered within 30 days
    mvvd_docs = documento.index[-200:]
    documento.loc[mvvd_docs, "docu_mate_dk"] = 43
    documento.loc[mvvd_docs, "docu_dt_cadastro"] = _ts(rs.randint(1, 28, 200)).values
    # planted: PPs registered ~80 days ago → inside the PPPV near-deadline window
    pppv_docs = documento.index[5600:5700]
    documento.loc[pppv_docs, "docu_cldc_dk"] = 395
    documento.loc[pppv_docs, "docu_dt_cadastro"] = _ts(rs.randint(72, 89, 100)).values
    documento.loc[pppv_docs, "docu_fsdc_dk"] = 1
    documento.loc[pppv_docs, "docu_tpst_dk"] = 1
    _write(warehouse, "exadata", "mcpr_documento", documento)

    # ---- vista / andamento / sub_andamento ---------------------------------
    n_vista = 12000
    vist_dk = np.arange(1, n_vista + 1)
    vista = pd.DataFrame({
        "vist_dk": vist_dk.astype("int64"),
        "vist_docu_dk": pd.array(rs.choice(docu_dk, n_vista), dtype="int64"),
        "vist_orgi_orga_dk": pd.array(rs.choice(org_ids, n_vista), dtype="int64"),
        "vist_dt_abertura_vista": _ts(rs.randint(0, 4000, n_vista)),
        "vist_dt_fechamento_vista": _ts(rs.randint(0, 3900, n_vista)).where(
            rs.rand(n_vista) > 0.3),
    })
    _write(warehouse, "exadata", "mcpr_vista", vista)

    arquivamento_codes = [7912, 6548, 6326, 6681, 6682, 6669, 6018, 6341]
    prorrog_codes = [6291, 7282, 7283]
    instauracao_codes = [6511, 6012, 6002, 6013, 6011, 6034, 6631, 7751, 6007]
    conversao_codes = [6014, 6251, 6252, 6253, 6259, 6260, 6516, 6533]
    baixa_codes = [6006, 6010, 6363, 6494, 6495, 6519, 6520, 6521, 6522, 6523]
    ciencia_codes = [6374, 6375, 6376, 6377, 6378]
    recurso_codes = [6449, 6451, 6453, 6529, 6530, 7824, 7850]
    oficio_anpp = [6497, 7920]
    noise_codes = [9001, 9002, 9003, 9004]
    all_codes = (arquivamento_codes + prorrog_codes + instauracao_codes
                 + conversao_codes + baixa_codes + ciencia_codes + recurso_codes
                 + oficio_anpp + noise_codes)

    n_and = 16000
    pcao_dk = np.arange(1, n_and + 1)
    and_days = rs.randint(0, 4000, n_and)
    and_dt = _ts(and_days)
    andamento = pd.DataFrame({
        "pcao_dk": pcao_dk.astype("int64"),
        "pcao_vist_dk": pd.array(rs.choice(vist_dk, n_and), dtype="int64"),
        "pcao_dt_andamento": and_dt,
        "pcao_dt_cancelamento": _ts(rs.randint(0, 300, n_and)).where(
            rs.rand(n_and) < 0.05),
        "pcao_tpsa_dk": pd.array(np.where(rs.rand(n_and) < 0.15, 2, 1), dtype="int64"),
        "year_month": pd.array(and_dt.dt.year * 100 + and_dt.dt.month, dtype="int64"),
    })
    # planted: recent andamentos (DT2I needs elapsed <= 7)
    recent = andamento.index[-400:]
    andamento.loc[recent, "pcao_dt_andamento"] = _ts(rs.randint(0, 7, 400)).values
    andamento.loc[recent, "pcao_dt_cancelamento"] = pd.NaT
    _write(warehouse, "exadata", "mcpr_andamento", andamento)

    n_sub = 16000
    stao_dk = np.arange(1, n_sub + 1)
    sub = pd.DataFrame({
        "stao_dk": stao_dk.astype("int64"),
        "stao_pcao_dk": pd.array(np.concatenate([pcao_dk[:12000],
                                                 rs.choice(pcao_dk, n_sub - 12000)]),
                                 dtype="int64"),
        "stao_tppr_dk": pd.array(rs.choice(all_codes, n_sub), dtype="int64"),
        "stao_nr_dias_prazo": pd.array(rs.randint(10, 60, n_sub), dtype="Int64"),
    })
    sub.loc[rs.rand(n_sub) < 0.3, "stao_nr_dias_prazo"] = pd.NA
    _write(warehouse, "exadata", "mcpr_sub_andamento", sub)

    _write(warehouse, "exadata", "mcpr_tp_andamento", pd.DataFrame({
        "tppr_dk": pd.array(all_codes, dtype="int64")}))
    _write(warehouse, "exadata_aux", "mmps_tp_andamento", pd.DataFrame({
        "id": pd.array(all_codes, dtype="int64"),
        "hierarquia": [f"ANDAMENTO > TIPO {c}" for c in all_codes],
    }))

    # ---- movimentações ------------------------------------------------------
    n_item = 9000
    item_dk = np.arange(1, n_item + 1)
    movi_dk = np.arange(1, n_item + 1)  # 1:1 item→movimentação
    dest_pool = np.concatenate([police_ids, court_ids, org_ids[:50],
                                np.array(ARCHIVE_ORGS)])
    recv_days = rs.randint(0, 2000, n_item)
    movimentacao = pd.DataFrame({
        "movi_dk": movi_dk.astype("int64"),
        "movi_orga_dk_origem": pd.array(rs.choice(org_ids, n_item), dtype="int64"),
        "movi_orga_dk_destino": pd.array(rs.choice(dest_pool, n_item), dtype="int64"),
        "movi_dt_recebimento_guia": _ts(recv_days).where(rs.rand(n_item) > 0.25),
        "movi_dt_envio_guia": _ts(recv_days + 3),
        "movi_dt_criacao_guia": _ts(recv_days + 5),
        "movi_tpgu_dk": pd.array(rs.choice([1, 2], n_item), dtype="int64"),
    })
    _write(warehouse, "exadata", "mcpr_movimentacao", movimentacao)

    _write(warehouse, "exadata", "mcpr_item_movimentacao", pd.DataFrame({
        "item_dk": item_dk.astype("int64"),
        "item_docu_dk": pd.array(rs.choice(docu_dk, n_item), dtype="int64"),
        "item_movi_dk": movi_dk.astype("int64"),
        "item_in_recebimento": pd.Series(
            np.where(rs.rand(n_item) < 0.5, "S", None), dtype="object"),
    }))

    # ---- pessoas ------------------------------------------------------------
    n_pess = 3000
    pess_dk = np.arange(1, n_pess + 1)
    first = rs.choice(["MARIA", "JOSE", "ANA", "JOAO", "PAULA", "CARLOS", "LUCIA",
                       "PEDRO", "JULIA", "MARCOS"], n_pess)
    last = rs.choice(["SILVA", "SANTOS", "OLIVEIRA", "SOUZA", "LIMA", "PEREIRA",
                      "COSTA", "FERREIRA"], n_pess)
    nomes = np.array([f"{a} {b} {i % 97}" for i, (a, b) in enumerate(zip(first, last))])
    maes = np.array([f"MAE {n}" for n in nomes])
    nasc_days = rs.randint(15 * 365, 85 * 365, n_pess)  # ages 15..85 at as_of
    pessoa_fisica = pd.DataFrame({
        "pesf_pess_dk": pess_dk.astype("int64"),
        "pesf_cpf": np.where(rs.rand(n_pess) < 0.1, "00000000000",
                             [f"{rs.randint(0, 10**10):011d}" for _ in range(n_pess)]),
        "pesf_nr_rg": [f"{rs.randint(0, 10**8):09d}" for _ in range(n_pess)],
        "pesf_nm_pessoa_fisica": np.where(rs.rand(n_pess) < 0.02, "MP", nomes),
        "pesf_nm_mae": maes,
        "pesf_dt_nasc": _ts(nasc_days),
    })
    _write(warehouse, "exadata", "mcpr_pessoa_fisica", pessoa_fisica)

    _write(warehouse, "exadata", "mcpr_pessoa", pd.DataFrame({
        "pess_dk": pess_dk.astype("int64"),
        "pess_nm_pessoa": np.where(rs.rand(n_pess) < 0.08, "MINISTERIO PUBLICO", nomes),
    }))
    _write(warehouse, "exadata_aux", "mmps_alias", pd.DataFrame({
        "alias": ["MINISTERIO PUBLICO", "MP - MPRJ"]}))

    n_pers = 9000
    # repeat victims: persons appearing in several docs (MVVD); accused + minors (PRCR)
    personagem = pd.DataFrame({
        "pers_docu_dk": pd.array(rs.choice(docu_dk, n_pers), dtype="int64"),
        "pers_pess_dk": pd.array(rs.choice(pess_dk[:800], n_pers), dtype="int64"),
        "pers_tppe_dk": pd.array(rs.choice([3, 290, 7, 21, 20, 14, 13, 18, 6, 248, 99],
                                           n_pers), dtype="int64"),
    })
    personagem["pers_pesf_dk"] = personagem["pers_pess_dk"]
    _write(warehouse, "exadata", "mcpr_personagem", personagem)

    # ---- correlacionamento / GATE / assuntos -------------------------------
    n_corr = 400
    _write(warehouse, "exadata", "mcpr_correlacionamento", pd.DataFrame({
        "corr_docu_dk2": pd.array(rs.choice(docu_dk, n_corr), dtype="int64"),
        "corr_tpco_dk": pd.array(rs.choice([1, 2, 3, 6], n_corr), dtype="int64"),
    }))

    n_it = 600
    _write(warehouse, "exadata", "gate_info_tecnica", pd.DataFrame({
        "itcn_dk": np.arange(1, n_it + 1).astype("int64"),
        "itcn_docu_dk": pd.array(rs.choice(docu_dk, n_it), dtype="int64"),
        "itcn_dt_cadastro": _ts(rs.randint(0, 2000, n_it)),
    }))

    penas = pd.DataFrame({
        "id": pd.array(range(1, len(_CRIMES) + 1), dtype="int64"),
        "nome_delito": [c[0] for c in _CRIMES],
        "artigo_lei": [f"Art. {100 + i} CP" for i in range(len(_CRIMES))],
        "max_pena": pd.array([c[1] for c in _CRIMES], dtype="float64"),
        "multiplicador": pd.array([c[2] for c in _CRIMES], dtype="int64"),
        "abuso_menor": pd.array([c[3] for c in _CRIMES], dtype="int64"),
    })
    _write(warehouse, "exadata_aux", "tb_penas_assuntos", penas)

    n_asdo = 4000
    _write(warehouse, "exadata", "mcpr_assunto_documento", pd.DataFrame({
        "asdo_docu_dk": pd.array(rs.choice(docu_dk, n_asdo), dtype="int64"),
        "asdo_assu_dk": pd.array(rs.choice(penas["id"], n_asdo), dtype="int64"),
        "asdo_dt_fim": _ts(rs.randint(0, 500, n_asdo)).where(rs.rand(n_asdo) < 0.1),
    }))

    # ---- opengeo: police reports -------------------------------------------
    rows = []
    year_now = AS_OF.year
    for deleg in range(1, 41):
        n_ro = int(rs.randint(20, 120))
        serials = np.arange(1, n_ro + 1)
        if deleg % 3 == 0:  # gaps → RO fires
            serials = np.delete(serials, rs.choice(len(serials) - 1,
                                                   size=min(5, len(serials) - 1),
                                                   replace=False))
        stale = deleg % 5 == 0  # last release >30d ago → FEBT fires
        for s in serials:
            year = year_now if rs.rand() < 0.7 else year_now - 1
            lib_days = int(rs.randint(35, 200)) if stale else int(rs.randint(0, 25))
            rows.append((f"{deleg:03d}-{s:05d}/{year}",
                         pd.Timestamp(AS_OF) - pd.Timedelta(days=lib_days)))
    _write(warehouse, "opengeo", "seg_pub_in_pol_procedimento", pd.DataFrame(
        rows, columns=["proc_numero", "data_liberacao"]))

    _write(warehouse, "exadata_aux", "tb_pip_cisp", pd.DataFrame({
        "cisp_codigo": pd.array(range(1, 41), dtype="int64"),
        "pip_codigo": pd.array(rs.choice(org_ids, 40), dtype="int64"),
        "cisp_nome_apresentacao": [f"DP {i:03d}" for i in range(1, 41)],
    }))

    # ---- opengeo: sanitation (ISPS) ----------------------------------------
    anos = [2020, 2021]
    for table, cols in [
        ("plataforma_amb_saneamento_snis_info_indic_agua",
         ["in009", "in013", "in023", "in049"]),
        ("plataforma_amb_saneamento_snis_info_indic_esgoto",
         ["in015", "in016", "in024", "in046"]),
    ]:
        frames = []
        for ano in anos:
            n_m = len(_MUNICIPIOS)
            f = pd.DataFrame({
                "ano_referencia": pd.array([ano] * (n_m + 1), dtype="int64"),
                "cod_mun": pd.array(list(range(1, n_m + 1)) + [33], dtype="int64"),
                "municipio": _MUNICIPIOS + ["Estado do Rio de Janeiro"],
                "cod_prest": pd.array([None] * (n_m + 1), dtype="Int64"),
            })
            for c in cols:
                f[c] = np.round(rs.uniform(20, 95, n_m + 1), 2)
            # some provider-level (non-aggregated) rows that must be excluded
            g = f.iloc[:5].copy()
            g["cod_prest"] = pd.array([7, 7, 8, 8, 9], dtype="Int64")
            frames.append(pd.concat([f, g]))
        _write(warehouse, "opengeo", table, pd.concat(frames, ignore_index=True))

    dren = pd.DataFrame({
        "ano_referencia": pd.array([2021] * len(_MUNICIPIOS), dtype="int64"),
        "municipio": _MUNICIPIOS,
        "in020": np.round(rs.uniform(10, 90, len(_MUNICIPIOS)), 2),
        "in021": np.round(rs.uniform(10, 90, len(_MUNICIPIOS)), 2),
        "in040": np.round(rs.uniform(0, 30, len(_MUNICIPIOS)), 2),
        "in041": np.round(rs.uniform(0, 30, len(_MUNICIPIOS)), 2),
    })
    _write(warehouse, "opengeo", "plataforma_amb_saneamento_snis_info_indic_drenagem",
           dren)
    _write(warehouse, "opengeo",
           "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018", pd.DataFrame({
               c: rs.uniform(100, 1000, 50)
               for c in ["ri013", "ri029", "ri067", "ge006", "ge008",
                         "ie017", "ie019", "ie024"]}))

    env_orgs = pacote[pacote["cod_pct"].isin([20, 21, 22, 24, 28, 183])]["id_orgao"]
    _write(warehouse, "opengeo", "institucional_orgaos_meio_ambiente", pd.DataFrame({
        "cod_orgao": pd.array(env_orgs, dtype="int64"),
        "comarca": rs.choice(_MUNICIPIOS, len(env_orgs)),
    }))

    # ---- compras (COMP) -----------------------------------------------------
    n_c = 200
    _write(warehouse, "alertas_compras", "compras_fora_padrao_capital", pd.DataFrame({
        "contratacao": pd.array(rs.randint(1, 10**6, n_c), dtype="int64"),
        "id_item": pd.array(rs.randint(1, 5000, n_c), dtype="int64"),
        "contrato_iditem": [f"CT{i:06d}-{rs.randint(1, 999):03d}" for i in range(n_c)],
        "item": rs.choice(["CANETA", "PAPEL A4", "NOTEBOOK", "CADEIRA", "TONER"], n_c),
        "dt_contratacao": [str(AS_OF - dt.timedelta(days=int(d)))
                           for d in rs.randint(0, 400, n_c)],
        "var_perc": np.round(rs.uniform(0, 80, n_c), 2),
    }))

    with open(os.path.join(warehouse, ".fixture_version"), "w") as fh:
        fh.write(VERSION)


def ensure_fixtures(warehouse: str) -> str:
    """Generate fixtures at ``warehouse`` unless the current VERSION is already there."""
    marker = os.path.join(warehouse, ".fixture_version")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == VERSION:
                return warehouse
    import shutil

    shutil.rmtree(warehouse, ignore_errors=True)
    generate(warehouse)
    return warehouse
