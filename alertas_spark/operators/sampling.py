"""Deterministic corpus sampling.

Training-data pipelines sample constantly — holdout splits, per-source mixing
ratios, decontamination spot-checks — and at 100 TB the sample must be
**deterministic and reshard-stable**: the same row set regardless of partitioning,
executor count, or re-runs, with no RNG state to coordinate.  ``rand(seed)`` gives
none of that (it is seeded per-partition); a content-keyed hash gives all of it.

The idiom: ``uniform = md5(key) mod M``, keep ``uniform < rate·M``.  Pure
scan-projection — zero shuffles, trivially pushes into any plan — and the md5 base
makes it bit-identical in the DuckDB oracle (the same trick the MinHash/SimHash
operators use; conventions: Spark ``conv(hex,16,10)`` ≡ DuckDB ``'0x'||hex::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: hash-space modulus: rates are expressed in basis points (1/10_000)
SAMPLE_MOD = 10_000

#: per-stratum sampling rates (basis points) for the stratified query: a mixing
#: recipe like "web is abundant → 10%, books are precious → 60%"
STRATUM_RATES = {"web": 1_000, "wiki": 3_000, "books": 6_000, "code": 2_500}
DEFAULT_RATE = 2_000

_SPARK_U = ("pmod(cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10) "
            f"AS bigint), {SAMPLE_MOD})")
_DUCK_U = ("CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
           f"AS BIGINT) % {SAMPLE_MOD}")


def _rate_case(col: str) -> str:
    branches = " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATUM_RATES.items())
    return f"CASE {col} {branches} ELSE {DEFAULT_RATE} END"


@declare(
    "sample_hash_stratified",
    oracle=f"""
    SELECT doc_id, source, {_DUCK_U} AS u
    FROM documents
    WHERE {_DUCK_U} < {_rate_case('source')}
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff its md5-derived uniform
    falls under its stratum's rate (per-``source`` mixing ratios).  Same rows on
    every run, every partitioning, every engine — the property RNG sampling can't
    give a distributed pipeline.  Nested subsets come free: a 10% sample is a strict
    subset of a 30% sample under the same key, so growing a mixing ratio only ADDS
    documents (stable training-set diffs)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("u", F.expr(_SPARK_U))
        .filter(F.col("u") < F.expr(_rate_case("source")))
        .select("doc_id", "source", "u")
    )
