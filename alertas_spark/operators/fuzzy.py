"""Fuzzy (edit-distance) near-duplicate detection — the string-metric member
of the dedup family.

MinHash/SimHash (operators/dedup.py) catch token-level overlap; an
edit-distance join catches character-level mutations (OCR noise, typos,
template fills) that token shingles miss.  The scale shape is the standard
blocked fuzzy join:

* **signature projection** — compare on a fixed-length normalized prefix
  (``SIG_LEN`` chars of ``lower(text)``), not whole documents: edit distance
  is O(len²) per pair, so the comparison window must be bounded up front.
* **blocking** — candidates must share a ``BLOCK_LEN``-char prefix, turning
  the O(n²) self-join into an equi-join shuffled on the block key with
  quadratic work only *within* blocks (at sf0.1: 406k candidate pairs from a
  12.5M-pair corpus; a production system would add q-gram-count filtering for
  a tighter candidate set — same plan shape).
* **banded verification** — ``levenshtein(a, b, threshold)``: Spark's
  three-argument form runs the banded O(d·n) DP and returns -1 past the
  threshold, so verification cost is bounded by ``MAX_DIST``, not by
  ``SIG_LEN²``.

All JVM-side expressions (no Python); the self-join shuffles both sides on
the block key, so at 100 TB each block's pair generation is local to one
partition and AQE handles block-size skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

BLOCK_LEN = 4    # chars of shared prefix that define a candidate block
SIG_LEN = 32     # normalized comparison window
MAX_DIST = 4     # edit-distance match threshold


@declare(
    "dedup_fuzzy_editdist",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               substring(lower(text), 1, {BLOCK_LEN}) AS blk,
               substring(lower(text), 1, {SIG_LEN}) AS sig
        FROM documents
        WHERE text IS NOT NULL AND strlen(text) >= {BLOCK_LEN}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.sig, b.sig) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.sig, b.sig) <= {MAX_DIST}
    """,
)
def dedup_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-duplicate pairs: documents whose normalized
    {SIG_LEN}-char signatures are within edit distance {MAX_DIST}, found via
    a {BLOCK_LEN}-char-prefix blocked self-join with banded levenshtein
    verification.  Exact (no probabilistic bands): the oracle recomputes the
    identical blocked join in DuckDB.  Documents shorter than the block key
    can't be blocked and are excluded on both sides."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()
                 & (F.length("text") >= BLOCK_LEN))
         .select("doc_id",
                 F.substring(F.lower("text"), 1, BLOCK_LEN).alias("blk"),
                 F.substring(F.lower("text"), 1, SIG_LEN).alias("sig")))
    a = d.select(F.col("doc_id").alias("doc_a"), "blk",
                 F.col("sig").alias("sig_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("blk").alias("blk_b"),
                 F.col("sig").alias("sig_b"))
    pairs = a.join(b, (F.col("blk") == F.col("blk_b"))
                   & (F.col("doc_a") < F.col("doc_b")))
    # banded DP: -1 past the threshold, so the filter keeps 0..MAX_DIST
    dist = F.levenshtein(F.col("sig_a"), F.col("sig_b"), MAX_DIST)
    return (pairs.withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .select("doc_a", "doc_b", F.col("dist").cast("int").alias("dist")))
