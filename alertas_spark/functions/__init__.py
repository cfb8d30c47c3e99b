from alertas_spark.functions.numeric import davg, dsum
from alertas_spark.functions.keys import alert_key, uuidsha

__all__ = ["davg", "dsum", "alert_key", "uuidsha"]
