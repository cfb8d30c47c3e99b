"""Alert-engine context: catalog binding + injected clock + options.

Replaces the reference's ``options`` dict of schema names threaded through every alert
(``/root/reference/src/alertas/main.py:21-31``) and its 14+ wall-clock call sites
(``current_date()``/``now()``, SURVEY §2.7) with one explicit context object:

* logical schemas (``exadata``, ``exadata_aux``, ``opengeo``, ``alertas``,
  ``alertas_compras``) bind to parquet directories under a warehouse root (tests /
  driver data) — on a cluster the same keys would bind to catalog databases;
* ``as_of`` is the injectable "today" — every date-relative predicate uses it, making
  alert runs reproducible (the reference's biggest testability defect, SURVEY §7).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMAS = ("exadata", "exadata_aux", "opengeo", "alertas", "alertas_compras")


@dataclass
class AlertContext:
    spark: SparkSession
    warehouse: str                    # root dir; tables at <warehouse>/<schema>/<table>.parquet
    as_of: dt.date = dt.date(2024, 4, 15)
    #: ≙ CLI options (main.py:59): prescription near-miss threshold in days
    prescricao_limiar: int = 90
    #: ≙ the reference's dev-schema branch firing ABR1 in every month (alerta_abr1.py:23-26)
    abr1_all_months: bool = False
    _views: dict[str, DataFrame] = field(default_factory=dict)

    # -- catalog ------------------------------------------------------------
    def _path(self, schema: str, name: str) -> str:
        return os.path.join(self.warehouse, schema, f"{name}.parquet")

    def table(self, schema: str, name: str) -> DataFrame:
        """≙ spark.table('<schema>.<table>') (jobs.py:190, alerta_bdpa.py:26)."""
        return self.spark.read.parquet(self._path(schema, name))

    def table_exists(self, schema: str, name: str) -> bool:
        return os.path.exists(self._path(schema, name))

    def write_table(self, schema: str, name: str, df: DataFrame, mode: str = "overwrite",
                    partition_by: str | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(self._path(schema, name))

    def drop_table(self, schema: str, name: str) -> None:
        shutil.rmtree(self._path(schema, name), ignore_errors=True)

    # -- shared base views (≙ jobs.py:190-250) ------------------------------
    def view(self, name: str) -> DataFrame:
        if name not in self._views:
            from alertas_spark.framework.base_views import build_view

            self._views[name] = build_view(self, name)
        return self._views[name]

    # -- injected clock -----------------------------------------------------
    @property
    def as_of_col(self):
        """≙ current_date()."""
        return F.lit(self.as_of.isoformat()).cast("date")

    @property
    def as_of_ts(self):
        """≙ current_timestamp() / now() — midnight of as_of (the reference's
        datediff(current_timestamp(), x) counts whole days anyway)."""
        return F.lit(self.as_of.isoformat()).cast("timestamp")
