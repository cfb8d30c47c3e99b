"""The 20-alert library — each ``alerta_<sigla>(ctx) -> DataFrame`` ≙ one reference
module ``alerta_<sigla>(options)`` (/root/reference/src/alertas/alerta_*.py), rebuilt
Spark-first with an injected clock."""

from alertas_spark.alerts.deadlines import (alerta_ic1a, alerta_nf30, alerta_pa1a,
                                            alerta_ppfp)
from alertas_spark.alerts.oversight import alerta_abr1, alerta_comp
from alertas_spark.alerts.police import alerta_febt, alerta_ro
from alertas_spark.alerts.prescription import alerta_prcr
from alertas_spark.alerts.returns import alerta_bdpa, alerta_dctj, alerta_dntj
from alertas_spark.alerts.sanitation import alerta_isps
from alertas_spark.alerts.simple import (alerta_dord, alerta_gate, alerta_offp,
                                         alerta_ouvi, alerta_vadf)
from alertas_spark.alerts.victims import alerta_dt2i, alerta_mvvd

__all__ = [
    "alerta_abr1", "alerta_bdpa", "alerta_comp", "alerta_dctj", "alerta_dntj",
    "alerta_dord", "alerta_dt2i", "alerta_febt", "alerta_gate", "alerta_ic1a",
    "alerta_isps", "alerta_mvvd", "alerta_nf30", "alerta_offp", "alerta_ouvi",
    "alerta_pa1a", "alerta_ppfp", "alerta_prcr", "alerta_ro", "alerta_vadf",
]
