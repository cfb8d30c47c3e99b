"""Alert family output contracts.

≙ the reference's positional ``COLUMN_ORDER_*`` lists (``/root/reference/src/alertas/
jobs.py:59-96``).  The rebuild keeps the declared order for external readers but aligns
by NAME (``select(*fieldNames)``), never by position — the reference's positional
``insertInto`` is fragile under schema drift (SURVEY §7 risk register).
"""

from __future__ import annotations

from pyspark.sql.types import (DoubleType, IntegerType, StringType, StructField, StructType,
                               TimestampType)


def _schema(*fields: tuple[str, type]) -> StructType:
    return StructType([StructField(n, t(), True) for n, t in fields])


BASE = [("alrt_key", StringType), ("alrt_sigla", StringType),
        ("alrt_orgi_orga_dk", IntegerType)]

#: ≙ COLUMN_ORDER_MGP (jobs.py:89-96)
MGP = _schema(*BASE,
              ("alrt_docu_dk", IntegerType),
              ("alrt_docu_nr_mp", StringType),
              ("alrt_date_referencia", TimestampType),
              ("alrt_dias_referencia", IntegerType),
              ("alrt_dk_referencia", IntegerType),
              ("alrt_info_adicional", StringType))

#: ≙ COLUMN_ORDER_ABR1 (jobs.py:66-69)
ABR1 = _schema(*BASE, ("abr1_nr_procedimentos", IntegerType), ("abr1_ano_mes", StringType))

#: ≙ COLUMN_ORDER_RO (jobs.py:70-75)
RO = _schema(*BASE,
             ("ro_nr_delegacia", StringType),
             ("ro_qt_ros_faltantes", IntegerType),
             ("ro_max_proc", StringType),
             ("ro_cisp_nome_apresentacao", StringType))

#: ≙ COLUMN_ORDER_COMP (jobs.py:76-83)
COMP = _schema(*BASE,
               ("comp_contratacao", IntegerType),
               ("comp_item", StringType),
               ("comp_id_item", IntegerType),
               ("comp_contrato_iditem", StringType),
               ("comp_dt_contratacao", StringType),
               ("comp_var_perc", DoubleType))

#: ≙ COLUMN_ORDER_ISPS (jobs.py:84-88)
ISPS = _schema(*BASE,
               ("isps_municipio", StringType),
               ("isps_indicador", StringType),
               ("isps_ano_referencia", IntegerType))

#: family table name → schema (≙ jobs.py:49-57,98-119)
FAMILY_TABLES = {
    "mmps_alertas_mgp": MGP,
    "mmps_alertas_abr1": ABR1,
    "mmps_alertas_ro": RO,
    "mmps_alertas_comp": COMP,
    "mmps_alertas_isps": ISPS,
}

#: ≙ alert-types dimension rows (jobs.py:148-174)
ALERT_TYPES = [
    ("DCTJ", "Documentos criminais sem retorno do TJ a mais de 60 dias"),
    ("DNTJ", "Documentos não criminais sem retorno do TJ a mais de 120 dias"),
    ("DORD", "Documentos com Órgão Responsável possivelmente desatualizado"),
    ("GATE", "Documentos com novas ITs do GATE"),
    ("BDPA", "Baixas a DP em atraso"),
    ("IC1A", "ICs sem prorrogação por mais de um ano"),
    ("MVVD", "Documentos com vitimas recorrentes recebidos nos ultimos 30 dias"),
    ("OFFP", "Ofício fora do prazo"),
    ("OUVI", "Expedientes de Ouvidoria (EO) pendentes de recebimento"),
    ("PA1A", "PAs sem prorrogação por mais de um ano"),
    ("PPFP", "Procedimento Preparatório fora do prazo"),
    ("PPPV", "Procedimento Preparatório próximo de vencer"),
    ("PRCR", "Processo possivelmente prescrito"),
    ("PRCR1", "Todos os crimes prescritos"),
    ("PRCR2", "Todos os crimes próximos de prescrever"),
    ("PRCR3", "Algum crime prescrito"),
    ("PRCR4", "Algum crime próximo de prescrever"),
    ("VADF", "Vistas abertas em documentos já fechados"),
    ("NF30", "Notícia de Fato a mais de 120 dias"),
    ("DT2I", "Movimento em processo de segunda instância"),
    ("RO", "ROs não entregues pelas delegacias"),
    ("ABR1", "Procedimentos que têm mais de 1 ano para comunicar ao CSMP"),
    ("ISPS", "Indicadores de Saneamento em Vermelho"),
    ("COMP", "Compras fora do padrão"),
    ("FEBT", "Mais de 30 dias sem novo RO"),
]
