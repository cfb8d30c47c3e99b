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

**Hashed-key scale tier (shipped r12, for the string-free outputs)** — in
``spans`` and ``scrub`` the K-char gram STRING never crosses a shuffle:
every wide stage is keyed on a 128-bit gram fingerprint (two independent
``xxhash64`` words, computed scan-side in the same codegen projection as
the ``substring``), so shuffle and cached rows carry 16-byte fixed-width
keys instead of 40-char strings and the exchange sorts/compares longs, not
UTF-8.  Collision contract: distinct grams colliding on BOTH words merge
their counts; expected colliding pairs ≈ n²/2¹²⁹ — at 100 TB (~10¹⁴
distinct grams) that is ~10⁻¹¹, i.e. zero in practice, whereas ONE 64-bit
word collides ~n²/2⁶⁵ ≈ 10⁸ times at the same n (why the tier ships two
words, not one).  Measured at the 10× replica: scrub 38.4 → 33.6 s (the
cached gram-partitioned copy sheds its only wide column), spans ~flat
(23.0 → 23.4 s — single-node shuffles land in the page cache, so key
width is CPU-neutral there; the bytes argument is a network-shuffle one
and the fingerprint costs nothing locally).  ``common`` alone keeps the
string-keyed single pass: its OUTPUT is the gram string, and the measured
re-read-the-winners variant regressed ~1.8× (numbers in its docstring).
The oracle SQL is unchanged: hashing is plan-internal, the compare exact.

No counterpart exists in the reference engine (its dedup surface is
row-level DISTINCT — e.g. ``/root/reference/src/alertas/alerta_mvvd.py``);
this module is part of the LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from alertas_spark.operators import memo
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: duplicated-window width (chars).  Lee et al. use 50 BPE tokens; 40 chars
#: is the same order of magnitude on this corpus's ~5-char words and keeps
#: every admissible fixture document (min length 44) in scope.
K = 40
#: heavy-hitter report size for ``dedup_substring_common``.
TOP_N = 100


#: the two-word 128-bit gram fingerprint, computed in the SAME codegen
#: projection as the substring — the string dies scan-side.  The second
#: word hashes the gram under a DIFFERENT effective seed (single-word
#: collision odds n²/2⁶⁵ are NOT acceptable at 10¹⁴ grams; the pair's
#: n²/2¹²⁹ is).  Argument order is load-bearing: Spark's multi-arg
#: xxhash64 folds left-to-right with the running hash as the next seed, so
#: the salt must come FIRST — xxhash64(salt, gram) = XXH64(gram, seed=
#: XXH64(salt, 42)), an independent word, whereas xxhash64(gram, salt)
#: would be XXH64(salt, seed=gh), a pure function of gh that adds ZERO
#: collision resistance (any gh collision collides gh2 with probability 1).
_GH = "xxhash64(substring(text, i, {K}))"
_GH2 = "xxhash64('sub2', substring(text, i, {K}))"


def _shingles(docs: DataFrame) -> DataFrame:
    """The K-window position stream: (doc_id, i, gh, gh2) — narrow (scan +
    explode + codegen projection); the gram string dies inside the
    projection, every shuffled consumer takes the 16-byte fingerprint."""
    return (docs
            .select("doc_id", "text",
                    F.explode(F.expr(f"sequence(1, length(text) - {K - 1})"))
                    .alias("i"))
            .select("doc_id", "i",
                    F.expr(_GH.format(K=K)).alias("gh"),
                    F.expr(_GH2.format(K=K)).alias("gh2")))


def _admissible_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.length("text") >= K)))


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
    than {K} chars have no window and are excluded.

    Computed by complement (r18): a position is duplicated iff its gram's
    corpus total is >= 2, so ``n_dup = n_pos - #singleton positions`` — and a
    SINGLETON gram (total 1) has exactly one position in exactly one document,
    so the per-doc singleton count is one hash agg over the gram totals, and
    ``n_pos = length - K + 1`` comes straight off the scan (every admissible
    document contributes each of its positions exactly once).  This shape
    drops the r12 plan's (gram, doc) pre-aggregation level AND the per-gram
    window sort entirely: the only corpus-sized exchange left is the gram-
    total hash agg, and everything downstream is singleton-sized.  Exact
    integer identity — bit-identical to the window form the oracle mirrors."""
    docs = _admissible_docs(spark, sf_dir)
    singles = (_shingles(docs)
               .groupBy("gh", "gh2")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.min("doc_id").alias("doc_id"))
               .filter(F.col("cnt") == 1)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_uniq")))
    base = docs.select("doc_id", (F.length("text") - (K - 1))
                       .cast("bigint").alias("n_pos"))
    return (base.join(singles, "doc_id", "left")
            .select("doc_id", "n_pos",
                    (F.col("n_pos") - F.coalesce("n_uniq", F.lit(0)))
                    .cast("bigint").alias("n_dup")))


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
    LIMIT is a total order.

    Scale shape — the one query in the family whose OUTPUT is the gram
    string, and (measured, r12) the one that keeps the STRING-keyed
    single-pass: the fingerprint-tier alternative (rollup on (gh, gh2), a
    broadcast 1-row threshold join selecting every fingerprint tying the
    {TOP_N}-th total, then a second narrow scan re-deriving strings for
    just the winners) was built and probed — 2.6 → 5.1 s at 1× and
    21.1 → 37.6 s at the 10× replica, a ~1.8× REGRESSION: on a single node
    the re-read's second explode+hash pass costs a full scan-CPU pass while
    the narrower shuffle keys save little (shuffle spills hit the page
    cache, not a network).  Since this query's downstream IS the string,
    one string-keyed pass is the honest shape; the string-free siblings
    (spans, scrub) ship the fingerprint tier where the cached/shuffled
    relations genuinely shed their widest column.  On a real network
    cluster the trade can reverse — the re-read variant lives in git
    history (r12) with both measurements if a deployment wants it.
    The global top-k is a TakeOrderedAndProject — per-partition heaps,
    only {TOP_N} rows cross the final exchange."""
    docs = _admissible_docs(spark, sf_dir)
    shingles = (docs
                .select("doc_id", "text",
                        F.explode(F.expr(
                            f"sequence(1, length(text) - {K - 1})"))
                        .alias("i"))
                .select("doc_id",
                        F.expr(f"substring(text, i, {K})").alias("gram")))
    n = shingles.sparkSession.sparkContext.defaultParallelism
    pg = (shingles.repartition(n, "gram")
          .groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("cnt")))
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
    ), dup AS (
        SELECT doc_id, i, i + {K - 1} AS e FROM rk
        WHERE cnt >= 2 AND rn >= 2
    ), marked AS (
        SELECT doc_id, i, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pe
        FROM dup
    ), numbered AS (
        SELECT doc_id, i, e,
               SUM(CASE WHEN pe IS NULL OR i > pe THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS g
        FROM marked
    ), islands AS (
        SELECT doc_id, g, MIN(i) AS s, MAX(e) AS e
        FROM numbered GROUP BY doc_id, g
    ), docs0 AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ), frags AS (
        SELECT doc_id,
               COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
                   AS fs,
               s - 1 AS fe
        FROM islands
        UNION ALL
        SELECT doc_id, MAX(e) + 1 AS fs, NULL AS fe
        FROM islands GROUP BY doc_id
        UNION ALL
        SELECT d.doc_id, 1 AS fs, NULL AS fe
        FROM docs0 d ANTI JOIN islands USING (doc_id)
    ), fr AS (
        SELECT f.doc_id, f.fs, COALESCE(f.fe, d.n) AS fe, d.n, d.text
        FROM frags f JOIN docs0 d USING (doc_id)
    ), removed AS (
        SELECT doc_id, SUM(e - s + 1) AS n_removed FROM islands
        GROUP BY doc_id
    )
    SELECT fr.doc_id,
           CAST(MAX(fr.n) AS BIGINT) AS n_chars,
           CAST(COALESCE(MAX(removed.n_removed), 0) AS BIGINT) AS n_removed,
           COALESCE(string_agg(
               CASE WHEN fe >= fs
                    THEN substr(text, CAST(fs AS INT),
                                CAST(fe - fs + 1 AS INT))
                    ELSE '' END, '' ORDER BY fs), '') AS text_scrub
    FROM fr LEFT JOIN removed USING (doc_id)
    GROUP BY fr.doc_id
    """,
)
def dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr REMOVAL step — produce the cleaned corpus, not just
    the statistics: every K-char window that duplicates an earlier occurrence
    (keep-first under the global (doc_id, position) order) has its characters
    removed, and each document is re-assembled from its surviving spans
    (Lee et al. ACL'22 cut duplicated spans the same way; ``dedup_lines`` is
    the fixed-token-grid cousin).  The FIRST occurrence of a duplicated
    window survives unless another duplicated window overlaps it —
    span-union semantics, stated contract.

    Scale shape — interval algebra, never per-character rows: keep-first is
    a ``min(struct(doc_id, i))`` + count hash agg per gram (map-side
    combined) with an equi join-back over ONE cached gram-partitioned
    shingle copy, NOT a rank window — a window funnels every occurrence of
    a mega-duplicated gram (billions at 100 TB for one boilerplate string)
    into one SORTING task, while here the mega-gram streams through a
    hash-join probe, linear and spill-free; the cache is disk-backed
    (shuffle-class cost, not a memory bet).  Both shapes were measured on
    the 10× clique replica: rank window 5.0 s/28.1 s (1×/10×), this form
    6.2 s/38.4 s — the ~1.2× premium buys away the single-task sort cliff,
    which on the target domain (license blocks, template boilerplate) is a
    job-killer, not a tail case.  Duplicated windows then merge into
    DISJOINT removed intervals per document with the gaps-and-islands
    running-max idiom (one doc-keyed window exchange — per-DOC partitions,
    bounded by document length), and each document re-assembles from the
    complement segments — codegen'd ``substring`` per kept span, a sorted
    collect_list of (position, fragment), segments per doc = islands + 1.
    The r11 first cut exploded K rows per duplicated window and LEFT-JOINed
    at char granularity: on a heavily-duplicated corpus (the 10× replica is
    ~90% duplicated windows) that is a K× row amplification — measured
    15.8× at 10× (93.5 s).  Zero-length documents have no characters and
    are excluded (same contract as ``dedup_lines``)."""
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.length("text") > 0))
            .select("doc_id", "text",
                    F.length("text").cast("bigint").alias("n")))
    sh = _shingles(docs.filter(F.col("n") >= K))
    # keep-first WITHOUT a rank window: "occurrence is removed iff its gram
    # occurs >= 2 times and it is not the lexicographic-min (doc_id, i)" is
    # the same set row_number()-over-gram selects, but min(struct) is a
    # map-side-combinable aggregate and the join-back an equi join — a rank
    # window funnels EVERY occurrence of a mega-gram (billions at 100 TB for
    # one boilerplate string) into one SORTING task; here the mega-gram
    # streams through a hash-join probe, linear and spill-free.  Structs
    # compare field-by-field, so min(struct(doc_id, i)) IS the keep-first
    # occurrence.  The shingle table is repartitioned on the fingerprint
    # ONCE and materialized through the tracked cache — a 24-byte
    # (doc_id, i, gh, gh2) row, no string column at all since r12 — so both
    # the stats agg and the join stream read the same HashPartitioning
    # (gh, gh2) copy: neither needs another exchange and the explode never
    # re-runs (an uncached shape re-computed the scan+explode per consumer
    # and shuffled the grams twice — measured 12.6 s vs ~5 s at sf0.1 on
    # the string tier).
    shc = memo.cached(
        sh.repartition(sh.sparkSession.sparkContext.defaultParallelism,
                       "gh", "gh2"))
    gstats = (shc.groupBy("gh", "gh2")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.min(F.struct("doc_id", "i")).alias("first"))
              .filter(F.col("cnt") >= 2))
    dup = (shc.join(gstats, ["gh", "gh2"])
           .filter(F.struct("doc_id", "i") != F.col("first"))
           .select("doc_id", "i", (F.col("i") + (K - 1)).alias("e")))
    # gaps-and-islands: an interval starts a new island iff it begins past
    # the running max end of everything before it; islands are disjoint by
    # construction, so their lengths sum without double counting
    wd = W.partitionBy("doc_id").orderBy("i")
    numbered = (dup
                .withColumn("pe", F.max("e").over(
                    wd.rowsBetween(W.unboundedPreceding, -1)))
                .withColumn("g", F.sum(
                    F.when(F.col("pe").isNull()
                           | (F.col("i") > F.col("pe")), 1).otherwise(0))
                    .over(wd.rowsBetween(W.unboundedPreceding, 0))))
    # cached: islands feeds FOUR consumers (the before-fragments, the tail
    # fragment, the untouched-documents anti join, and the removed-length
    # rollup), and Catalyst does not dedupe identical subtrees — uncached,
    # the whole shc-scan → keep-first join → interval window pipeline ran
    # four times (four identical stages measured at sf0.1, ~3/4 of the
    # query's executor time).  The relation is duplicated-interval-sized,
    # tiny next to the shingle stream.
    islands = memo.cached(
        numbered.groupBy("doc_id", "g")
        .agg(F.min("i").alias("s"), F.max("e").alias("e")))
    # kept fragments: before each island, after the last island, and the
    # whole document when nothing was removed
    wi = W.partitionBy("doc_id").orderBy("s")
    before = islands.select(
        "doc_id",
        (F.coalesce(F.lag("e").over(wi), F.lit(0)) + 1).alias("fs"),
        (F.col("s") - 1).alias("fe"))
    tail = (islands.groupBy("doc_id")
            .agg((F.max("e") + 1).alias("fs"),
                 F.lit(None).cast("bigint").alias("fe")))
    whole = (docs.join(islands, "doc_id", "left_anti")
             .select("doc_id", F.lit(1).cast("bigint").alias("fs"),
                     F.lit(None).cast("bigint").alias("fe")))
    frags = before.unionByName(tail).unionByName(whole)
    fr = (frags.join(docs, "doc_id")
          .withColumn("fe", F.coalesce("fe", "n"))
          .withColumn("frag", F.when(
              F.col("fe") >= F.col("fs"),
              F.expr("substring(text, cast(fs as int), "
                     "cast(fe - fs + 1 as int))")).otherwise(F.lit(""))))
    removed = (islands.groupBy("doc_id")
               .agg(F.sum(F.col("e") - F.col("s") + 1).alias("n_removed")))
    return (fr.join(removed, "doc_id", "left")
            .groupBy("doc_id")
            .agg(F.max("n").cast("bigint").alias("n_chars"),
                 F.coalesce(F.max("n_removed"), F.lit(0)).cast("bigint")
                 .alias("n_removed"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(
                         F.struct("fs", "frag"))),
                         lambda s: s["frag"]), "").alias("text_scrub")))
