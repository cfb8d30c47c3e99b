"""Stable alert identity keys.

The reference's only live UDF is ``uuidsha`` — sha1-hex over the ascii-sanitized,
stringified concatenation of the key columns (``/root/reference/src/alertas/
utils.py:26-43``), used by 13 alerts to mint ``alrt_key``.  The rebuild expresses it
entirely with JVM built-ins (no Python UDF → no serialization boundary in the hot path):

    sha1(concat_ws('', <canonical string per column>))

Canonical serialization (documented contract, pinned by golden tests):
* NULL → empty string (the reference renders None via ``str`` inside ``limpa`` which
  drops non-ascii — we normatively define NULL→'').
* timestamps/dates → ISO 'yyyy-MM-dd HH:mm:ss' / 'yyyy-MM-dd'.
* numbers → minimal decimal form via CAST TO STRING.
* non-ascii characters are stripped (reference ``limpa``, ``utils.py:26-31``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _canon(col: Column) -> Column:
    s = F.coalesce(col.cast("string"), F.lit(""))
    # strip non-ascii, ≙ reference limpa() (utils.py:26-31)
    return F.regexp_replace(s, r"[^\x00-\x7F]", "")


def uuidsha(*cols: Column) -> Column:
    """sha1 hex of the canonical concatenation of ``cols`` (≙ utils.py:40-43)."""
    return F.sha1(F.concat_ws("", *[_canon(c) for c in cols]))


def alert_key(sigla: Column | str, key: Column, orgao: Column) -> Column:
    """``alrt_key = sigla || '.' || key || '.' || orgao`` — the dismissed-alert store
    contract (``jobs.py:264-271``; HBase key format create_hbase_ext_table.sql:1-8).
    A NULL key falls back to 'KEYUNDEFINED' (``jobs.py:268-270``)."""
    sig = F.lit(sigla) if isinstance(sigla, str) else sigla
    return F.concat_ws(".", sig, F.coalesce(key.cast("string"), F.lit("KEYUNDEFINED")),
                       orgao.cast("string"))
