"""Substring-level exact deduplication — the ExactSubstr operator family.

Line-level dedup (``dedup_lines``) removes repeated fixed-token spans; the
substring tier detects ANY repeated character window of length ``K`` across
the corpus, the signal behind suffix-array training-data dedup (Lee et al.,
*Deduplicating Training Data Makes Language Models Better*, ACL 2022): a
position is *duplicated* iff the K-char window starting there occurs at
least twice anywhere in the corpus (another document or elsewhere in the
same one — verbatim self-repetition is the same memorization risk).

Spark-first shape — the single-node reference algorithm is one giant suffix
array, which does not distribute; the shuffle-native equivalent is a
K-shingle group-by, exact for fixed K:

* **shingle explode** (narrow): ``sequence(1, len-K+1)`` + posexplode +
  codegen'd ``substring`` — no shuffle, rows = total characters.
* **one wide shuffle, keyed on gram alone**: ``HashPartitioning(gram)``
  satisfies the clustering requirement of every downstream stage — the
  (gram, doc) pre-count, the per-gram window totals, and the per-gram
  rollup — so the K-char gram strings cross the wire exactly once (a
  groupBy-first shape re-shuffled them for the window; measured
  4.4 → 3.0 s at sf0.1, 35.4 → 22.9 s at the 10× replica).
* **corpus totals** as a window sum over ``gram`` (exchange-free on the
  gram partitioning): each gram's occurrence count lands next to its
  per-doc rows without a join-back of the raw shingle stream.
* **per-doc rollup** (the one narrow-key shuffle): duplicated-position
  counts per document — the actionable filter column (drop or trim docs
  whose duplicated fraction is high).

Every stage is a linear scan + combinable hash agg; no stage is quadratic
in anything (contrast the near-dup family, whose OUTPUT is pair-shaped).
The gram string itself is the shuffle key here for oracle exactness; at
100 TB carry ``xxhash64(gram)`` (8-byte keys, collision odds ~n²/2⁶⁵)
through shuffles 1-2 and keep the string only where the output needs it
(``dedup_substring_common``'s top-k projection re-reads just the winners).

No counterpart exists in the reference engine (its dedup surface is
row-level DISTINCT — e.g. ``/root/reference/src/alertas/alerta_mvvd.py``);
this module is part of the LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: duplicated-window width (chars).  Lee et al. use 50 BPE tokens; 40 chars
#: is the same order of magnitude on this corpus's ~5-char words and keeps
#: every admissible fixture document (min length 44) in scope.
K = 40
#: heavy-hitter report size for ``dedup_substring_common``.
TOP_N = 100


def _gram_doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gram, doc_id, cnt): occurrences of each K-gram within each document.

    The shingle explode is scan-side and narrow; the hash agg is the corpus-
    character-sized shuffle, map-side combined so repeated windows collapse
    before the exchange."""
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.length("text") >= K)))
    shingles = (docs
                .select("doc_id", "text",
                        F.explode(F.expr(f"sequence(1, length(text) - {K - 1})"))
                        .alias("i"))
                .select("doc_id",
                        F.expr(f"substring(text, i, {K})").alias("gram")))
    # ONE wide shuffle, keyed on gram alone: HashPartitioning(gram) satisfies
    # clustering for the (gram, doc_id) agg, the gram window, AND the
    # per-gram rollup downstream, so the 40-char gram strings cross the wire
    # exactly once (the groupBy-first shape shuffled them twice — agg
    # exchange on (gram, doc_id), window re-exchange on gram; measured
    # 4.4 -> 3.0 s at sf0.1 and 35.4 -> 22.9 s at the 10x replica, which
    # also pulls the 10x ratio back under linear).  Map-side combine is not
    # lost in any way that matters: K-gram keys are near-unique per doc, so
    # the partial agg collapsed almost nothing.
    n = shingles.sparkSession.sparkContext.defaultParallelism
    return (shingles.repartition(n, "gram")
            .groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("cnt")))


@declare(
    "dedup_substring_spans",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, substr(text, CAST(t.i AS INT), {K}) AS gram
        FROM documents CROSS JOIN LATERAL
             unnest(range(1, length(text) - {K - 2})) AS t(i)
        WHERE text IS NOT NULL AND length(text) >= {K}
    ), pg AS (
        SELECT gram, doc_id, count(*) AS cnt FROM pos GROUP BY gram, doc_id
    ), gt AS (
        SELECT gram, doc_id, cnt, sum(cnt) OVER (PARTITION BY gram) AS tot
        FROM pg
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN tot >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup
    FROM gt GROUP BY doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring statistics: of a document's
    ``n_pos`` K-char window positions, ``n_dup`` start a window that occurs
    >= 2 times in the corpus — the ExactSubstr memorization-risk signal
    (``n_dup / n_pos`` is the duplicated fraction; counts are emitted raw so
    the cross-engine compare never crosses a float seam).  Documents shorter
    than {K} chars have no window and are excluded."""
    pg = _gram_doc_counts(spark, sf_dir)
    tot = F.sum("cnt").over(W.partitionBy("gram"))
    return (pg.withColumn("tot", tot)
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("bigint").alias("n_pos"),
                 F.sum(F.when(F.col("tot") >= 2, F.col("cnt"))
                       .otherwise(F.lit(0))).cast("bigint").alias("n_dup")))


@declare(
    "dedup_substring_common",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, substr(text, CAST(t.i AS INT), {K}) AS gram
        FROM documents CROSS JOIN LATERAL
             unnest(range(1, length(text) - {K - 2})) AS t(i)
        WHERE text IS NOT NULL AND length(text) >= {K}
    ), pg AS (
        SELECT gram, doc_id, count(*) AS cnt FROM pos GROUP BY gram, doc_id
    )
    SELECT gram,
           CAST(sum(cnt) AS BIGINT) AS occurrences,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pg GROUP BY gram
    HAVING count(*) >= 2
    ORDER BY occurrences DESC, gram
    LIMIT {TOP_N}
    """,
)
def dedup_substring_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {TOP_N} most widely duplicated K-grams that span documents
    (boilerplate / license-block / template discovery: what you grep the
    corpus for before writing removal rules).  Deterministic: ordered by
    total occurrences then gram; grams are unique post-aggregation, so the
    LIMIT is a total order.  The global top-k is a TakeOrderedAndProject —
    per-partition heaps, only {TOP_N} rows cross the final exchange."""
    pg = _gram_doc_counts(spark, sf_dir)
    return (pg.groupBy("gram")
            .agg(F.sum("cnt").cast("bigint").alias("occurrences"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
            .orderBy(F.desc("occurrences"), F.asc("gram"))
            .limit(TOP_N))


@declare(
    "dedup_substring_scrub",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS i,
               substr(text, CAST(t.i AS INT), {K}) AS gram
        FROM documents CROSS JOIN LATERAL
             unnest(range(1, length(text) - {K - 2})) AS t(i)
        WHERE text IS NOT NULL AND length(text) >= {K}
    ), rk AS (
        SELECT doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY gram
                                  ORDER BY doc_id, i) AS rn,
               COUNT(*) OVER (PARTITION BY gram) AS cnt
        FROM sh
    ), rem AS (
        SELECT DISTINCT doc_id, CAST(u.c AS BIGINT) AS c
        FROM rk CROSS JOIN LATERAL unnest(range(i, i + {K})) AS u(c)
        WHERE cnt >= 2 AND rn >= 2
    ), ch AS (
        SELECT doc_id, CAST(t.c AS BIGINT) AS c,
               substr(text, CAST(t.c AS INT), 1) AS ch
        FROM documents CROSS JOIN LATERAL
             unnest(range(1, length(text) + 1)) AS t(c)
        WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT ch.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN rem.c IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN rem.c IS NULL THEN ch.ch END, ''
                               ORDER BY ch.c), '') AS text_scrub
    FROM ch LEFT JOIN rem ON ch.doc_id = rem.doc_id AND ch.c = rem.c
    GROUP BY ch.doc_id
    """,
)
def dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr REMOVAL step — produce the cleaned corpus, not just
    the statistics: every K-char window that duplicates an earlier occurrence
    (keep-first under the global (doc_id, position) order) has its characters
    removed, and each document is re-assembled from its surviving characters
    (Lee et al. ACL'22 cut duplicated spans the same way; ``dedup_lines`` is
    the fixed-token-grid cousin).  The FIRST occurrence of a duplicated
    window survives unless another duplicated window overlaps it —
    span-union semantics, stated contract.

    Scale shape: the occurrence ranking is one window over ``gram``
    (rank + count share the partition key, one exchange); removed positions
    explode K rows per duplicated window and dedupe to char granularity; the
    re-assembly is the ``dedup_lines`` idiom — char rows LEFT-JOIN the
    removed set on (doc, position), one per-doc agg with a sorted
    collect_list.  Every stage is linear in corpus characters (the same size
    class as the shingle scan itself); a mega-duplicated gram makes a big
    window partition — the same skew class as ``dedup_lines``'s line window,
    bounded because position-tagged occurrences of one gram are capped by
    corpus size, not by pair products.  Zero-length documents have no
    characters and are excluded (same contract as ``dedup_lines``)."""
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    sh = (docs.filter(F.length("text") >= K)
          .select("doc_id", "text",
                  F.explode(F.expr(f"sequence(1, length(text) - {K - 1})"))
                  .alias("i"))
          .select("doc_id", "i",
                  F.expr(f"substring(text, i, {K})").alias("gram")))
    wg = W.partitionBy("gram")
    rk = (sh.withColumn("rn", F.row_number().over(
              wg.orderBy("doc_id", "i")))
          .withColumn("cnt", F.count(F.lit(1)).over(wg)))
    rem = (rk.filter((F.col("cnt") >= 2) & (F.col("rn") >= 2))
           .select("doc_id",
                   F.explode(F.expr(f"sequence(i, i + {K - 1})")).alias("c"))
           .distinct())
    ch = (docs.filter(F.length("text") > 0)
          .select("doc_id", "text",
                  F.explode(F.expr("sequence(1, length(text))")).alias("c"))
          .select("doc_id", "c", F.expr("substring(text, c, 1)").alias("ch")))
    flagged = (ch.join(rem.withColumn("rem", F.lit(1)), ["doc_id", "c"],
                       "left"))
    kept = F.when(F.col("rem").isNull(), F.struct("c", "ch"))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_chars"),
                 F.sum(F.when(F.col("rem").isNotNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_removed"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept)),
                                 lambda s: s["ch"]), "").alias("text_scrub")))
