"""Semi-structured (JSON) processing over the events ``props`` column.

Two tiers, mirroring how a 100 TB pipeline should treat JSON:

* **typed extraction** (``from_json`` with an explicit schema) — the scale
  path: the parse happens once per row into a columnar struct, pruning and
  predicate pushdown stay effective, and downstream expressions are ordinary
  typed columns (no per-access re-parse the way chained ``get_json_object``
  calls re-parse).
* **VARIANT** (``parse_json`` + ``variant_get``) — Spark 4's open-schema
  binary JSON encoding, for payloads whose shape is NOT known up front;
  bucketing the extracted value shows the variant column behaving as a
  first-class expression input.

Both are exact-oracle-checked against DuckDB's JSON functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "json_props_typed_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON extraction (``from_json``) + integer aggregate per
    event type.  One parse per row into a typed struct; integer sums are
    exact, so no decimal contract is needed.  Malformed/missing keys become
    NULL (counted separately via ``n_k`` vs ``n_events``)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint")["k"]
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.count("k").alias("n_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


@declare(
    "json_props_variant_buckets",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10)
                AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema extraction via Spark 4 VARIANT: ``parse_json`` the payload
    once, ``try_variant_get`` the key with a target type, decile-bucket the
    value.  The variant column is the shape to store when producers evolve
    the payload freely — extraction stays an expression, not a reparse of
    the raw string per accessed key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("event_type",
                     F.floor(F.col("k") / 10).cast("bigint").alias("bucket"))
            .agg(F.count("*").alias("n")))
