"""Semi-structured (JSON) processing over the events ``props`` column.

Two tiers, mirroring how a 100 TB pipeline should treat JSON:

* **typed extraction** (``from_json`` with an explicit schema) — the scale
  path: the parse happens once per row into a columnar struct, pruning and
  predicate pushdown stay effective, and downstream expressions are ordinary
  typed columns (no per-access re-parse the way chained ``get_json_object``
  calls re-parse).
* **VARIANT** (``try_parse_json`` + ``try_variant_get``) — Spark 4's
  open-schema binary JSON encoding, for payloads whose shape is NOT known up
  front; bucketing the extracted value shows the variant column behaving as a
  first-class expression input.

Both are exact-oracle-checked against DuckDB's JSON functions, **with the
coercion semantics pinned on both sides** (the r7 driver red): Spark's two
extraction tiers disagree with each other *and* with a naive
``CAST(json_extract_string(...))`` oracle on non-integer-typed payloads, so
each oracle below mirrors its Spark function's exact rules (empirically
verified per payload shape; pinned by tests/test_semistructured_pin.py):

=====================  ==================  =====================
JSON ``$.k`` payload   from_json 'bigint'  try_variant_get bigint
=====================  ==================  =====================
``12`` (int in range)  12                  12
``"12"`` / ``" 12 "``  NULL                12   (string→int, trimmed)
``"3.7"`` / ``"abc"``  NULL                NULL (string must be integral)
``3.7`` / ``3.0``      NULL                3    (double → trunc toward 0)
``-3.7`` / ``-0.5``    NULL                -3 / 0  (toward zero, not floor)
``1e3``                NULL                1000
``true`` / ``false``   NULL                1 / 0
int64 overflow         NULL                NULL
``null`` / missing     NULL                NULL
malformed JSON         NULL                NULL (``try_parse_json``)
=====================  ==================  =====================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: DuckDB expression mirroring ``from_json(props, 'k bigint')['k']``:
#: strict — only payloads whose JSON *type* is integer (and in int64 range)
#: extract; quoted numerics, doubles, booleans, arrays, malformed JSON → NULL.
#: ``json_valid`` guards ``json_type`` (which ERRORS on malformed input);
#: TRY_CAST guards the UBIGINT > int64-max band.
STRICT_K = """
 CASE WHEN props IS NOT NULL AND json_valid(props)
           AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
 END"""

#: DuckDB expression mirroring ``try_variant_get(try_parse_json(props), '$.k',
#: 'bigint')``: coercive — quoted integral strings cast (after trim; sign and
#: leading zeros accepted, non-integral strings NULL), doubles truncate toward
#: zero (TRUNC, not FLOOR/round — DuckDB's double→int CAST rounds, so TRUNC
#: first), booleans → 1/0, anything out of int64 range NULL.
#:
#: Trim semantics (verified live against Spark 4): Spark's string→bigint cast
#: strips leading/trailing codepoints <= U+0020 (ASCII space and ALL control
#: chars — tab, newline, CR, NUL...), and nothing else: U+00A0 (NBSP) is NOT
#: stripped, so ``" 12"`` is NULL in Spark.  DuckDB's ``TRIM`` strips a
#: different set, so the mirror trims via regexp_replace over the exact class
#: ``[\x00-\x20]`` instead — divergent in both directions otherwise
#: (``"\t12"`` → 12 in Spark / NULL under TRIM; NBSP-padded → NULL in Spark /
#: 12 under TRIM).  Pinned by tests/test_semistructured_pin.py.
_VK_TRIMMED = (
    "regexp_replace(json_extract_string(props, '$.k'),"
    " '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g')"
)
VARIANT_K = f"""
 CASE WHEN props IS NOT NULL AND json_valid(props) THEN
   CASE json_type(props, '$.k')
     WHEN 'BIGINT'  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
     WHEN 'UBIGINT' THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
     WHEN 'DOUBLE'  THEN TRY_CAST(TRUNC(TRY_CAST(json_extract_string(props, '$.k')
                                                 AS DOUBLE)) AS BIGINT)
     WHEN 'BOOLEAN' THEN CASE json_extract_string(props, '$.k')
                         WHEN 'true' THEN 1 ELSE 0 END
     WHEN 'VARCHAR' THEN CASE
         WHEN regexp_matches({_VK_TRIMMED}, '^[+-]?[0-9]+$')
         THEN TRY_CAST({_VK_TRIMMED} AS BIGINT) END
   END
 END"""


@declare(
    "json_props_typed_extract",
    oracle=f"""
    WITH ext AS (
        SELECT event_type, {STRICT_K} AS k
        FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n_k,
           CAST(CAST(SUM(k) AS VARCHAR) AS DOUBLE) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM ext GROUP BY event_type
    """,
)
def json_props_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON extraction (``from_json``) + integer aggregate per
    event type.  One parse per row into a typed struct; integer sums are
    exact, so no decimal contract is needed.  Malformed payloads, missing
    keys, and **non-integer-typed values** (quoted numbers, doubles,
    booleans — from_json is strict) become NULL, counted separately via
    ``n_k`` vs ``n_events``."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint")["k"]
    # SUM over decimal(38,0), not bigint: a fixture containing int64-max k
    # overflows the long accumulator under ANSI mode (task-killing error),
    # while DuckDB sums in int128 — decimal accumulation is exact and
    # order-independent on both engines; the final single cast to DOUBLE
    # (same round-to-nearest on the same exact integer) is the cross-engine
    # comparable surface, per the repo decimal contract (plans/merge.py).
    # Cost disclosure: the int128 accumulator leaves the codegen'd long fast
    # path (~0.5 s → ~1.4-1.9 s at sf0.1 in BENCH_LOCAL) but stays linear
    # (10× probe 2.7×, SCALING.md) — crash-immunity over raw speed is the
    # right default for an aggregate fed by arbitrary JSON payloads.
    # try_sum(bigint) would keep long speed but its overflow-NULL depends on
    # partial-accumulation order (a transiently-overflowing sum of mixed-sign
    # values is NULL or a value depending on partitioning) — nondeterminism
    # the engine's contracts forbid.
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.count("k").alias("n_k"),
                 F.sum(F.col("k").cast("decimal(38,0)")).cast("double")
                  .alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


@declare(
    "json_props_variant_buckets",
    oracle=f"""
    WITH ext AS (
        SELECT event_type, {VARIANT_K} AS k
        FROM events)
    SELECT event_type,
           CAST(FLOOR(k / 10) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM ext
    WHERE k IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema extraction via Spark 4 VARIANT: ``try_parse_json`` the
    payload once (NULL on malformed input — plain ``parse_json`` FAILFASTs
    the whole task on one bad row), ``try_variant_get`` the key with a target
    type, decile-bucket the value.  The variant column is the shape to store
    when producers evolve the payload freely — extraction stays an
    expression, not a reparse of the raw string per accessed key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("event_type",
                     F.floor(F.col("k") / 10).cast("bigint").alias("bucket"))
            .agg(F.count("*").alias("n")))
