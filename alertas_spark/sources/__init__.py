from alertas_spark.sources.catalog import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
