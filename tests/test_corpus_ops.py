"""Semantic properties of the corpus-pipeline operators (beyond oracle equality).

The DuckDB oracles pin cross-engine value equality; these tests pin the properties
the operators PROMISE in their docstrings — the invariants a pipeline author relies
on — on the sf0.001 testdata.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _run(spark, name: str):
    from alertas_spark.registry import load_all

    return load_all()[name].builder(spark, SF)


# ---------------------------------------------------------------------------
# shuffle_shards: a reproducible permutation
# ---------------------------------------------------------------------------


def test_shuffle_shards_is_a_permutation(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "shuffle_shards").cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    try:
        # every document exactly once
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()
        # pos is a dense 1..n_shard numbering within each shard
        per_shard = out.groupBy("shard").agg(
            F.count("*").alias("n"), F.min("pos").alias("lo"),
            F.max("pos").alias("hi"), F.countDistinct("pos").alias("nd"))
        bad = per_shard.filter(
            (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
            | (F.col("nd") != F.col("n"))).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_shuffle_shards_is_rerun_stable(spark):
    a = {(r.doc_id, r.shard, r.pos) for r in _run(spark, "shuffle_shards").collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in _run(spark, "shuffle_shards").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# dataset_mix_weighted: weights realized, diffs nested
# ---------------------------------------------------------------------------


def test_dataset_mix_copy_counts_bracket_the_weight(spark):
    from pyspark.sql import functions as F

    from alertas_spark.operators.sampling import MIX_DEFAULT_BP, MIX_WEIGHTS_BP

    per_doc = (
        _run(spark, "dataset_mix_weighted")
        .groupBy("doc_id", "source").agg(F.count("*").alias("copies"))
        .collect()
    )
    for r in per_doc:
        w_bp = MIX_WEIGHTS_BP.get(r.source, MIX_DEFAULT_BP)
        lo, hi = w_bp // 10_000, -(-w_bp // 10_000)  # floor, ceil
        assert max(lo, 1) <= r.copies <= max(hi, 1), (r.source, r.copies, w_bp)


def test_dataset_mix_growing_a_weight_only_adds_copies(spark, monkeypatch):
    import alertas_spark.operators.sampling as sampling

    base = {(r.doc_id, r.copy_idx)
            for r in _run(spark, "dataset_mix_weighted").collect()
            if r.source == "src0"}
    grown_bp = dict(sampling.MIX_WEIGHTS_BP, src0=sampling.MIX_WEIGHTS_BP["src0"] + 4_000)
    monkeypatch.setattr(sampling, "MIX_WEIGHTS_BP", grown_bp)
    # rebuild through the module function directly (the registry caches the oracle
    # string at import, but the builder reads the weight dict at call time)
    grown = {(r.doc_id, r.copy_idx)
             for r in sampling.dataset_mix_weighted(spark, SF).collect()
             if r.source == "src0"}
    assert base <= grown
    assert len(grown) > len(base)


# ---------------------------------------------------------------------------
# dataset_mix_temperature: T→1 is natural sampling; T>1 flattens the mixture
# ---------------------------------------------------------------------------


def test_mix_temperature_at_t1_is_natural_sampling(spark):
    """α = 1/T = 1 ⇒ q_s = p_s ⇒ every document gets exactly one copy (the
    fixed-recipe equivalence: dataset_mix_weighted with all weights 10000 bp)."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.sampling import _mix_temperature

    out = _mix_temperature(spark, SF, 1.0)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("copies"))
    assert per_doc.filter(F.col("copies") != 1).count() == 0
    assert per_doc.count() == docs.count()


def test_mix_temperature_flattens_toward_uniform(spark):
    """T = 2 moves every source's share of the MIXED corpus strictly toward
    the uniform share, relative to its natural share (the recipe's purpose),
    and respects the per-source epoch cap."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.sampling import MIX_CAP_BP

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nat = {r.source: r.n for r in
           docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    mixed = {r.source: r.n for r in
             _run(spark, "dataset_mix_temperature")
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_nat, n_mix = sum(nat.values()), sum(mixed.values())
    uni = 1.0 / len(nat)
    for s, n in nat.items():
        p_nat, p_mix = n / n_nat, mixed.get(s, 0) / n_mix
        if abs(p_nat - uni) > 1e-9:
            # strictly between natural and uniform (cap can stop short of
            # uniform but never overshoot past it)
            assert (abs(p_mix - uni) < abs(p_nat - uni)
                    or abs(p_mix - p_nat) < 1e-9), (s, p_nat, p_mix)
        # cap: no doc repeated more than ceil(cap) times
        per_doc_max = (_run(spark, "dataset_mix_temperature")
                       .filter(F.col("source").eqNullSafe(F.lit(s)))
                       .groupBy("doc_id").agg(F.count("*").alias("c"))
                       .agg(F.max("c")).collect()[0][0])
        assert per_doc_max <= -(-MIX_CAP_BP // 10_000)


# ---------------------------------------------------------------------------
# dedup_lines: keep-first, conservation, idempotence
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lines_out(spark):
    from alertas_spark.registry import load_all

    df = load_all()["dedup_lines"].builder(spark, SF).cache()
    yield df
    df.unpersist()


def test_dedup_lines_conserves_and_only_removes(spark, lines_out):
    rows = lines_out.select("doc_id", "n_lines", "n_kept").collect()
    assert all(0 <= r.n_kept <= r.n_lines for r in rows)
    # at least one duplicate line must exist in the fixture for the test to bite
    assert any(r.n_kept < r.n_lines for r in rows)


def test_dedup_lines_keeps_exactly_one_copy_per_distinct_line(spark, lines_out):
    from pyspark.sql import functions as F

    from alertas_spark.operators.dedup import LINE_TOKENS

    # keep-first ⇒ Σ n_kept == number of DISTINCT lines in the original corpus
    distinct_lines = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("tok", F.regexp_extract_all(F.lower(F.col("text")),
                                                F.lit("[a-z0-9]+"), 0))
        .withColumn("n", F.size("tok"))
        .filter(F.col("n") > 0)
        .withColumn("ord", F.explode(F.expr(
            f"sequence(0, cast(ceil(n / {LINE_TOKENS}.0) as int) - 1)")))
        .select(F.array_join(
            F.slice("tok", F.col("ord") * LINE_TOKENS + 1, LINE_TOKENS), " ")
            .alias("line"))
        .distinct().count()
    )
    total_kept = lines_out.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept == distinct_lines


def test_dedup_lines_all_duplicate_doc_reassembles_empty(spark, tmp_path):
    import pandas as pd

    from alertas_spark.registry import load_all

    # doc 2 is an exact copy of doc 1: every one of its lines loses keep-first,
    # so it must survive with n_kept=0 and an EMPTY text_dedup (not vanish, not
    # NULL); doc 3 has no tokens at all and is out of scope on both engines.
    text = " ".join(f"tok{i}" for i in range(20))  # 20 tokens → 3 lines of ≤8
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [text, text, "!!! ??? ..."],
        "lang": ["en"] * 3,
        "source": ["srcA"] * 3,
        "n_chars": [len(text), len(text), 11],
    }).to_parquet(tmp_path / "documents.parquet")

    out = {r.doc_id: r for r in
           load_all()["dedup_lines"].builder(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}, "token-less docs are out of scope, copies are not"
    assert out[1].n_kept == out[1].n_lines == 3
    assert out[1].text_dedup == text
    assert out[2].n_lines == 3 and out[2].n_kept == 0
    assert out[2].text_dedup == ""


def test_source_gate_thresholds_and_doc_flag(spark):
    # every surviving row's source meets the threshold; no surviving doc fails
    # the doc-level flag; and at least one source was gated away entirely
    from alertas_spark.operators.textops import (SRC_PASS_THRESHOLD,
                                                 source_quality_gate)
    from alertas_spark.sources.catalog import load_table

    rows = source_quality_gate(spark, SF).collect()
    assert rows
    assert all(r.src_pass_rate >= SRC_PASS_THRESHOLD for r in rows)
    survivors = {r.source for r in rows}
    all_sources = {r.source for r in
                   load_table(spark, SF, "documents").select("source").distinct().collect()}
    assert survivors < all_sources  # the gate actually dropped some origin


def test_ngram_jaccard_fails_fast_past_the_doc_cap(spark, monkeypatch):
    from alertas_spark.operators import dedup
    import pytest

    monkeypatch.setattr(dedup, "EXACT_PAIRS_MAX_DOCS", 10)
    with pytest.raises(RuntimeError, match="exact all-pairs verifier"):
        dedup.dedup_ngram_jaccard(spark, SF)


def test_pipeline_v2_is_exactly_gate_intersect_representatives(spark):
    from alertas_spark.operators.dedup import dedup_cluster_representative
    from alertas_spark.operators.pipeline import pipeline_clean_corpus_v2
    from alertas_spark.operators.textops import source_quality_gate

    v2 = {r.doc_id for r in pipeline_clean_corpus_v2(spark, SF).collect()}
    gate = {r.doc_id for r in source_quality_gate(spark, SF).collect()}
    reps = {r.rep_doc_id for r in dedup_cluster_representative(spark, SF).collect()}
    assert v2 == gate & reps
    assert v2  # the composition is non-degenerate on the fixture


def test_prefix_filter_equals_all_pairs_verifier(spark):
    """The prefix-filtered exact Jaccard join must produce EXACTLY the all-pairs
    verifier's output at its threshold — prefix filtering prunes candidates,
    never results (the AllPairs correctness guarantee, operators/dedup.py).
    The raw-string verifier filtered to t=0.7 must agree with the hashed
    prefix-filter output pair-for-pair and value-for-value (also pins that
    31-bit shingle hashing introduces no collision on the fixture)."""
    from alertas_spark.operators.dedup import (PF_THRESHOLD,
                                               dedup_jaccard_prefix_filter,
                                               dedup_ngram_jaccard)

    exact = sorted(tuple(r) for r in dedup_ngram_jaccard(spark, SF).collect()
                   if r["jaccard"] >= PF_THRESHOLD)
    pf = sorted(tuple(r) for r in dedup_jaccard_prefix_filter(spark, SF).collect())
    assert pf == exact and len(pf) > 0


def test_ranked_topk_invariant_under_adversarial_layouts(spark):
    """Pin the phase-1-contains-top-k invariant of the two-phase top-k
    (operators/topk.py) under adversarial layouts, not just the docstring
    argument: one giant partition, more partitions than rows/k, ALL rows
    crammed into one of several partitions (skew), a range layout that splits
    score ties across partitions — and tiny Arrow batches so the running
    per-batch shortlist concat path actually executes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from alertas_spark.operators.topk import ranked_topk

    rows = [(i % 5, i, float((i * 37) % 11)) for i in range(400)]
    base = spark.createDataFrame(rows, "k int, vid long, score double")
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.asc("vid"))
    want = sorted(map(tuple, base.withColumn("rnk", F.row_number().over(w))
                      .filter("rnk <= 6").collect()))
    layouts = [
        base.repartition(1),
        base.repartition(97),
        base.repartition(5, F.lit(0)),          # skew: every row in one of 5
        base.repartitionByRange(7, "score"),    # duplicate scores split apart
    ]
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "16")
        for df in layouts:
            got = sorted(map(tuple, ranked_topk(
                df, "k", "score", "vid", 6, ascending=False).collect()))
            assert got == want
    finally:
        spark.conf.set(key, prev)


# ---------------------------------------------------------------------------
# dedup_substring_*: ExactSubstr duplicated-window semantics
# ---------------------------------------------------------------------------


def test_substring_spans_hand_computed(spark, tmp_path):
    import pandas as pd

    from alertas_spark.registry import load_all

    # 80 DISTINCT printable chars -> all 41 windows of doc 1 are unique text
    uniq = "".join(chr(33 + i) for i in range(80))
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            uniq,        # 41 windows, duplicated only via doc 2's copy
            uniq,        # exact copy: every window occurs twice corpus-wide
            "z" * 41,    # 2 windows, both the SAME gram: self-repetition
            "w" * 39,    # below K=40 -> excluded entirely
        ],
        "lang": ["en"] * 4, "source": ["t"] * 4,
        "n_chars": [80, 80, 41, 39],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: (r["n_pos"], r["n_dup"])
           for r in load_all()["dedup_substring_spans"]
           .builder(spark, str(tmp_path)).collect()}
    # doc 4 has no K-window; docs 1/2 fully duplicated by each other; doc 3's
    # two positions duplicate EACH OTHER (verbatim self-repetition counts)
    assert out == {1: (41, 41), 2: (41, 41), 3: (2, 2)}


def test_substring_common_requires_cross_document(spark, tmp_path):
    import pandas as pd

    from alertas_spark.registry import load_all

    uniq = "".join(chr(33 + i) for i in range(80))
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [uniq, uniq, "z" * 41],
        "lang": ["en"] * 3, "source": ["t"] * 3, "n_chars": [80, 80, 41],
    }).to_parquet(tmp_path / "documents.parquet")
    rows = (load_all()["dedup_substring_common"]
            .builder(spark, str(tmp_path)).collect())
    # the 41 doc1/doc2 shared windows qualify (n_docs=2); doc 3's
    # within-document repeat does NOT (n_docs=1 despite occurrences=2)
    assert len(rows) == 41
    assert all(r["occurrences"] == 2 and r["n_docs"] == 2 for r in rows)
    assert all("z" not in r["gram"] for r in rows)


def test_substring_spans_counts_every_window_on_testdata(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "dedup_substring_spans")
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.col("text").isNotNull() & (F.length("text") >= 40))
            .select("doc_id", (F.length("text") - 39).alias("want")))
    joined = out.join(docs, "doc_id", "full").cache()
    try:
        # exactly the admissible docs appear, each with n_pos = len-K+1
        assert joined.filter("n_pos IS NULL OR want IS NULL").count() == 0
        assert joined.filter("n_pos != want").count() == 0
        assert joined.filter("n_dup < 0 OR n_dup > n_pos").count() == 0
    finally:
        joined.unpersist()


# ---------------------------------------------------------------------------
# split_leakage_safe: cluster-granular split invariants
# ---------------------------------------------------------------------------


def test_split_is_constant_within_every_cluster(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "split_leakage_safe").cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    try:
        # total: every document assigned exactly once
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()
        # THE invariant: one split per component — near-dups cannot straddle
        assert (out.groupBy("component")
                .agg(F.countDistinct("split").alias("n"))
                .filter("n > 1").count()) == 0
        # all three splits non-degenerate on the fixture, bucket in range
        assert out.filter("bucket < 0 OR bucket >= 1000").count() == 0
        got = {r["split"] for r in out.select("split").distinct().collect()}
        assert got == {"train", "val", "test"}
    finally:
        out.unpersist()


def test_split_agrees_with_minhash_pairs(spark):
    # every MinHash near-dup PAIR ends up in one split: join the pair list
    # against the assignment on both endpoints
    out = _run(spark, "split_leakage_safe").select("doc_id", "split")
    pairs = _run(spark, "dedup_minhash_lsh").select("doc_a", "doc_b")
    a = out.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa")
    b = out.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb")
    assert pairs.join(a, "doc_a").join(b, "doc_b").filter("sa != sb").count() == 0


# ---------------------------------------------------------------------------
# perplexity_unigram: hand-computed cross-entropy
# ---------------------------------------------------------------------------


def test_perplexity_unigram_hand_computed(spark, tmp_path):
    import math

    import pandas as pd

    from alertas_spark.registry import load_all

    # corpus counts: a:2, b:1, N=3
    #   doc 1 "a a": H = ln3 - (2*ln2)/2 = ln(3/2)
    #   doc 2 "b":   H = ln3 - ln1      = ln 3
    #   doc 3 "":    zero tokens -> excluded
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a", "b", "..."],
        "lang": ["en"] * 3, "source": ["t"] * 3, "n_chars": [3, 1, 3],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: (r["n_tokens"], r["cross_entropy_nats"])
           for r in load_all()["perplexity_unigram"]
           .builder(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    assert out[1][0] == 2 and out[2][0] == 1
    assert out[1][1] == pytest.approx(round(math.log(1.5), 6), abs=1e-6)
    assert out[2][1] == pytest.approx(round(math.log(3.0), 6), abs=1e-6)


def test_perplexity_unigram_is_nonnegative_and_total(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "perplexity_unigram").cache()
    try:
        # every token's corpus count <= N, so each -ln p term >= 0
        assert out.filter("cross_entropy_nats < 0").count() == 0
        # token mass conservation: sum of n_tokens == corpus token count
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        total = (docs.filter(F.col("text").isNotNull())
                 .select(F.size(F.regexp_extract_all(
                     F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0))
                     .alias("n"))
                 .agg(F.sum("n")).collect()[0][0])
        assert out.agg(F.sum("n_tokens")).collect()[0][0] == total
    finally:
        out.unpersist()


def test_substring_scrub_keep_first_semantics(spark, tmp_path):
    import pandas as pd

    from alertas_spark.registry import load_all

    uniq = "".join(chr(33 + i) for i in range(80))
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            uniq,        # first occurrence of every window -> fully kept
            uniq,        # every window rn=2 -> fully scrubbed
            "z" * 41,    # self-repeat: window@1 kept, window@2 removed
            "w" * 39,    # below K -> no windows -> fully kept
        ],
        "lang": ["en"] * 4, "source": ["t"] * 4, "n_chars": [80, 80, 41, 39],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r.asDict()
           for r in load_all()["dedup_substring_scrub"]
           .builder(spark, str(tmp_path)).collect()}
    assert out[1]["text_scrub"] == uniq and out[1]["n_removed"] == 0
    assert out[2]["text_scrub"] == "" and out[2]["n_removed"] == 80
    # doc 3: removed span = chars 2..41 (the rn=2 window), first char survives
    assert out[3]["text_scrub"] == "z" and out[3]["n_removed"] == 40
    assert out[4]["text_scrub"] == "w" * 39 and out[4]["n_removed"] == 0


def test_substring_scrub_conserves_characters(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "dedup_substring_scrub").cache()
    try:
        # length(text_scrub) + n_removed == n_chars on every row
        assert out.filter(
            F.length("text_scrub") + F.col("n_removed") != F.col("n_chars")
        ).count() == 0
        # the fixture contains near-dups, so scrubbing must bite somewhere
        assert out.agg(F.sum("n_removed")).collect()[0][0] > 0
        # scrubbed text is a subsequence start-anchored check: every doc's
        # kept text has length <= original
        assert out.filter(F.length("text_scrub") > F.col("n_chars")).count() == 0
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# simsearch_topk_hamming: binary-tier invariants
# ---------------------------------------------------------------------------


def test_hamming_topk_shape_and_bounds(spark):
    from pyspark.sql import functions as F

    out = _run(spark, "simsearch_topk_hamming").cache()
    try:
        # distance is 0..64 (one sign bit per dimension), self excluded,
        # exactly TOP_K ranks 1..k per query, ranks strictly ordered by
        # (hamming, cand_id)
        assert out.filter("hamming < 0 OR hamming > 64").count() == 0
        assert out.filter("query_id = cand_id").count() == 0
        per_q = out.groupBy("query_id").agg(
            F.count("*").alias("n"), F.min("rnk").alias("lo"),
            F.max("rnk").alias("hi"))
        assert per_q.filter("n != 5 OR lo != 1 OR hi != 5").count() == 0
        disordered = out.alias("a").join(
            out.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.rnk") + 1 == F.col("b.rnk"))
            & ((F.col("a.hamming") > F.col("b.hamming"))
               | ((F.col("a.hamming") == F.col("b.hamming"))
                  & (F.col("a.cand_id") > F.col("b.cand_id")))))
        assert disordered.count() == 0
    finally:
        out.unpersist()


def test_hamming_identical_vector_is_rank_one(spark, tmp_path):
    import pandas as pd

    from alertas_spark.registry import load_all

    # vec 20 is an exact copy of query 0 -> hamming 0 -> rank 1;
    # vec 21 flips one dimension's sign -> hamming 1
    base = [1.0 if i % 3 else -1.0 for i in range(64)]
    flip = list(base)
    flip[7] = -flip[7]
    rows = [(0, base, 0), (20, list(base), 1), (21, flip, 1)]
    rows += [(i, [(-1.0) ** (i + j) for j in range(64)], 2)
             for i in range(30, 36)]
    pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [r[1] for r in rows],
        "label": [r[2] for r in rows],
    }).to_parquet(tmp_path / "embeddings.parquet")
    out = [(r["cand_id"], r["hamming"]) for r in
           load_all()["simsearch_topk_hamming"]
           .builder(spark, str(tmp_path))
           .filter("query_id = 0").orderBy("rnk").collect()]
    assert out[0] == (20, 0)
    assert out[1] == (21, 1)


def test_decontaminate_embedding_partition_and_flag(spark):
    """Eval vectors never appear as training rows, every valid training
    vector appears exactly once, and the contamination flag is exactly
    (score's unrounded cosine >= DECON_TAU) — spot-checked via the rounded
    score being consistent with the flag outside the rounding band."""
    from pyspark.sql import functions as F

    from alertas_spark.operators.simsearch import (DECON_EVAL_CAP, DECON_MOD,
                                                   DECON_TAU)
    from alertas_spark.registry import load_all

    rows = (load_all()["decontaminate_embedding"]
            .builder(spark, SF).collect())
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert not (r["vec_id"] % DECON_MOD == 0 and r["vec_id"] < DECON_EVAL_CAP)
        assert r["eval_id"] % DECON_MOD == 0 and r["eval_id"] < DECON_EVAL_CAP
        assert -1.000001 <= r["score"] <= 1.000001
        if abs(r["score"] - DECON_TAU) > 1e-5:  # outside the rounding band
            assert r["contaminated"] == int(r["score"] >= DECON_TAU)


def test_perplexity_bigram_backoff_branches_hand_computed(spark, tmp_path):
    """All three scoring branches pinned on a crafted corpus: doc 10 is held
    out (doc_id % 10 == 0) and contains a bigram absent from the reference,
    so it must hit the backoff path; reference docs never back off; and the
    quantized term algebra reproduces the hand-computed entropy."""
    import math

    import pandas as pd

    from alertas_spark.operators.textops import PPL_QLN_BACKOFF
    from alertas_spark.registry import load_all

    # reference (ids 1,2): "aa bb" x 2 -> unigrams aa:2 bb:2, bigram (aa,bb):2
    # held out (id 10): "aa bb" (all in-model) + "bb aa" (unseen bigram)
    pd.DataFrame({
        "doc_id": [1, 2, 10],
        "text": ["aa bb", "aa bb", "aa bb aa"],
        "lang": ["en"] * 3, "source": ["t"] * 3,
        "n_chars": [5, 5, 8],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in
           load_all()["perplexity_bigram_backoff"]
           .builder(spark, str(tmp_path)).collect()}
    q = lambda x: round(math.log(x) * 1e9)
    N = 4  # reference tokens: aa,bb,aa,bb
    # doc 1/2: pos1 unigram aa -> qN - q(2); bigram (aa,bb) -> q(cu aa)=q2 - q(cb)=q2
    t_ref = (q(N) - q(2)) + (q(2) - q(2))
    assert out[1]["n_backoff"] == 0 == out[2]["n_backoff"]
    assert out[1]["cross_entropy_nats"] == round(t_ref / 2 / 1e9, 6)
    # doc 10: pos1 aa (qN - q2); (aa,bb) in-model (q2 - q2);
    # (bb,aa) UNSEEN -> backoff: qln(1/0.4) + qN - q(cu aa)=q2
    t10 = (q(N) - q(2)) + (q(2) - q(2)) + (PPL_QLN_BACKOFF + q(N) - q(2))
    assert out[10]["n_backoff"] == 1
    assert out[10]["n_tokens"] == 3
    assert out[10]["cross_entropy_nats"] == round(t10 / 3 / 1e9, 6)


def test_perplexity_kn_trigram_branches_hand_computed(spark, tmp_path):
    """All three interpolated-KN levels pinned on a crafted corpus against
    by-hand probability algebra (D = 3/4, reference docs 1–2 = "a b c" ×2,
    held-out doc 10 = "a b c b c").

    Hand-derived reference tables: trigram types {(a,b,c): 2}; bigram types
    {(a,b), (b,c)} → N1+(··)=2, W1=2; vocab {a,b,c} → V=4; context (a,b):
    c(uv·)=2, N1+(uv·)=1; middle b: N1+(·b·)=1, M(b)=1; continuations
    N1+(·b)=N1+(·c)=1."""
    import math

    import pandas as pd

    from alertas_spark.registry import load_all

    pd.DataFrame({
        "doc_id": [1, 2, 10],
        "text": ["a b c", "a b c", "a b c b c"],
        "lang": ["en"] * 3, "source": ["t"] * 3,
        "n_chars": [5, 5, 9],
    }).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in
           load_all()["perplexity_kn_trigram"]
           .builder(spark, str(tmp_path)).collect()}
    # unigram level: p1(w) = [max(4·N1+(·w)−3, 0)·V + 3·W1] / (4·V·N1+(··))
    p1_a = (0 * 4 + 3 * 2) / (4 * 4 * 2)        # a never a continuation
    p1_b = (1 * 4 + 3 * 2) / (4 * 4 * 2)
    # middle level for v=b: p2 = [max(4·N1+(·bw)−3,0) + 3·M(b)·p1] / (4·N1+(·b·))
    p2_c_b = (1 + 3 * 1 * p1_b) / (4 * 1)
    # top level, context (a,b): p3 = [max(4·c3−3,0) + 3·N1+(uv·)·p2] / (4·c(uv·))
    p3_c_ab = (max(4 * 2 - 3, 0) + 3 * 1 * p2_c_b) / (4 * 2)
    q = lambda p: round(-math.log(p) * 1e9)
    # doc 1/2 "a b c": a→lvl1 (first), b→lvl1 (prev=a not a trigram middle),
    # c→lvl3 (context (a,b) seen)
    t_ref = q(p1_a) + q(p1_b) + q(p3_c_ab)
    for d in (1, 2):
        assert (out[d]["n_tri"], out[d]["n_big"], out[d]["n_uni"]) == (1, 0, 2)
        assert out[d]["cross_entropy_nats"] == round(t_ref / 3 / 1e9, 6)
    # doc 10 "a b c b c": a→lvl1, b→lvl1, c|(a,b)→lvl3, b|(b,c)→lvl1
    # (context (b,c) unseen AND prev=c not a middle), c|(c,b)→lvl2
    # (context (c,b) unseen, prev=b IS a middle)
    t10 = q(p1_a) + q(p1_b) + q(p3_c_ab) + q(p1_b) + q(p2_c_b)
    assert (out[10]["n_tri"], out[10]["n_big"], out[10]["n_uni"]) == (1, 1, 3)
    assert out[10]["n_tokens"] == 5
    assert out[10]["cross_entropy_nats"] == round(t10 / 5 / 1e9, 6)


def test_perplexity_kn_probabilities_normalize(spark, tmp_path):
    """Σ_w p(w|u,v) over the closed V-word vocabulary (incl. the OOV slot)
    is exactly 1 at every level — the property the discount algebra exists
    for.  Checked by hand-summing the crafted corpus's distributions."""
    # reference "a b c" ×2 (tables as in the sibling test)
    V, n1dd, W1 = 4, 2, 2
    p1 = {w: (max(4 * n - 3, 0) * V + 3 * W1) / (4 * V * n1dd)
          for w, n in {"a": 0, "b": 1, "c": 1}.items()}
    p1_oov = (0 * V + 3 * W1) / (4 * V * n1dd)
    assert abs(sum(p1.values()) + p1_oov - 1.0) < 1e-12
    # level 2, v=b: seen continuation c, everything else through p1
    p2 = {w: (max(4 * (1 if w == "c" else 0) - 3, 0) + 3 * 1 * p1.get(w, p1_oov))
          / (4 * 1) for w in ("a", "b", "c", "_oov")}
    assert abs(sum(p2.values()) - 1.0) < 1e-12
    # level 3, context (a,b): seen trigram c
    p3 = {w: (max(4 * (2 if w == "c" else 0) - 3, 0) + 3 * 1 * p2[w]) / (4 * 2)
          for w in ("a", "b", "c", "_oov")}
    assert abs(sum(p3.values()) - 1.0) < 1e-12


def test_ccnet_buckets_are_per_lang_terciles(spark):
    """ccnet_perplexity_buckets: within each lang the three buckets differ
    in size by at most 1 (NTILE contract) and head entropy <= middle <=
    tail at the boundaries (the ordering the cut is FOR)."""
    from collections import defaultdict

    from alertas_spark.registry import load_all

    rows = (load_all()["ccnet_perplexity_buckets"]
            .builder(spark, "/root/testdata/sf0.001").collect())
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["cross_entropy_nats"])
    assert len(by_lang) >= 2
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [len(buckets[b]) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert max(buckets["head"]) <= min(buckets["middle"]) or \
            any(abs(a - b) < 1e-12 for a in buckets["head"]
                for b in buckets["middle"])
        assert max(buckets["middle"]) <= min(buckets["tail"]) or \
            any(abs(a - b) < 1e-12 for a in buckets["middle"]
                for b in buckets["tail"])


def test_semantic_edges_within_cluster_only(spark):
    """SemDeDup pins: (a) a ≥ tau pair in ONE cluster becomes an edge; (b) the
    same geometry split ACROSS clusters is never scored (the paper's
    documented recall trade); (c) a sub-tau within-cluster pair is rejected;
    (d) an oversized cluster fails fast instead of going silently O(n²)."""
    import pytest

    from alertas_spark.operators import dedup
    from alertas_spark.operators.semantic import semantic_edges

    def row(vid, cid, x, y):
        import math
        return (vid, [x, y], cid, math.sqrt(x * x + y * y))

    assigned = spark.createDataFrame(
        [
            row(1, 0, 1.0, 0.0), row(2, 0, 1.0, 0.05),   # cos≈0.999 ≥ tau
            row(3, 0, 0.0, 1.0),                          # ⊥ to 1/2 → no edge
            row(4, 1, 1.0, 0.0),                          # same dir as 1, other
        ],                                                # cluster → unscored
        "vec_id long, emb array<double>, cid long, nrm double")
    got = {(r["src"], r["dst"]) for r in semantic_edges(assigned).collect()}
    assert got == {(1, 2)}

    big = spark.createDataFrame(
        [row(i, 0, 1.0, 0.0) for i in range(4)],
        "vec_id long, emb array<double>, cid long, nrm double")
    with pytest.raises(Exception, match="retrain the quantizer"):
        import unittest.mock as mock
        with mock.patch.object(dedup, "BLOCK_MAX_ROWS", 2):
            # the UDF closure reads semantic.BLOCK_MAX_ROWS (imported name)
            from alertas_spark.operators import semantic
            with mock.patch.object(semantic, "BLOCK_MAX_ROWS", 2):
                semantic_edges(big).collect()


def test_dedup_embedding_semantic_keep_is_min_per_group(spark):
    """End-to-end invariants on the fixture: every group's keep row is its
    minimum vec_id, exactly one keep per component, labels cover all valid
    vectors, and group size matches the label multiplicity."""
    from alertas_spark.operators.semantic import dedup_embedding_semantic

    pdf = dedup_embedding_semantic(spark, "/root/testdata/sf0.001").toPandas()
    assert (pdf.groupby("component")["keep"].sum() == 1).all()
    grp = pdf.groupby("component")["vec_id"]
    assert (grp.min() == grp.min().index).all()          # label = min member
    sizes = pdf.groupby("component").size()
    assert (pdf["n_group"] == pdf["component"].map(sizes)).all()
    assert pdf["vec_id"].is_unique


def test_vocab_growth_curve_totals_and_monotonicity(spark):
    from pyspark.sql import functions as F

    from alertas_spark.sources.catalog import load_table

    rows = sorted(_run(spark, "vocab_growth_curve").collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == sorted(r.decile for r in rows)
    cv = [r.cum_vocab for r in rows]
    assert cv == sorted(cv) and cv[-1] >= cv[0]
    # running sums must reconcile with their per-decile columns
    assert cv[-1] == sum(r.n_new_tokens for r in rows)
    assert rows[-1].cum_occurrences == sum(r.n_occurrences for r in rows)
    # and the end of the curve IS the corpus: total distinct tokens + total
    # token occurrences, independently recomputed
    tok = (load_table(spark, SF, "documents")
           .filter(F.col("text").isNotNull())
           .select(F.explode(F.regexp_extract_all(
               F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)).alias("t")))
    assert cv[-1] == tok.select("t").distinct().count()
    assert rows[-1].cum_occurrences == tok.count()


def test_length_bucketed_batching_bounds_and_beats_arrival_order(spark):
    from pyspark.sql import functions as F

    from alertas_spark.operators.packing import BATCH_DOCS
    from alertas_spark.sources.catalog import load_table

    rows = _run(spark, "pack_length_bucketed").collect()
    assert rows
    assert all(1 <= r.n_docs <= BATCH_DOCS for r in rows)
    assert all(r.padding_waste == r.n_docs * r.max_len - r.n_tokens >= 0
               for r in rows)
    bucketed_waste = sum(r.padding_waste for r in rows)

    # arrival-order baseline: batch the same docs by doc_id order, no
    # bucketing — the op's whole point is beating this
    toks = sorted(
        (r.doc_id, r.n) for r in
        load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)).alias("n"))
        .filter(F.col("n") > 0).collect())
    arrival_waste = 0
    for i in range(0, len(toks), BATCH_DOCS):
        batch = [n for _, n in toks[i:i + BATCH_DOCS]]
        arrival_waste += len(batch) * max(batch) - sum(batch)
    assert bucketed_waste <= arrival_waste


# ---------------------------------------------------------------------------
# dataset_mix_unimax: closed-form waterfill properties
# ---------------------------------------------------------------------------


def test_unimax_waterfill_hand_computed(spark, tmp_path):
    """Three sources with capacities 30/150/3000 (E=3) under B=450 total
    chars: tiny takes its full 30-cap; the remaining 420 splits 210/210 —
    mid's cap (150) < its fair share so mid is ALSO full?  No: the prefix
    test is in CAPACITY order — verify against the by-hand waterfill."""
    import pandas as pd

    from alertas_spark.registry import load_all

    # n_chars per source: a=10, b=50, c=390  (total B = 450)
    rows = ([(i, "x", "en", "a", 1) for i in range(10)]
            + [(100 + i, "x", "en", "b", 5) for i in range(10)]
            + [(200 + i, "x", "en", "c", 39) for i in range(10)])
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                     "n_chars"])
    df.to_parquet(tmp_path / "documents.parquet")
    out = {r.source: r for r in
           load_all()["dataset_mix_unimax"]
           .builder(spark, str(tmp_path)).collect()}
    # caps: a=30, b=150, c=1170; B=450.
    # i=1 (a): 0 + 30·3 = 90 ≤ 450 → full 30
    # i=2 (b): 30 + 150·2 = 330 ≤ 450 → full 150
    # i=3 (c): 180 + 1170·1 = 1350 > 450 → share (450−180)//1 = 270
    assert out["a"].alloc_chars == 30 and out["a"].epochs_bp == 30000
    assert out["b"].alloc_chars == 150 and out["b"].epochs_bp == 30000
    assert out["c"].alloc_chars == 270
    assert out["c"].epochs_bp == 270 * 10000 // 390
    # budget conserved exactly (single floor share, no remainder here)
    assert sum(r.alloc_chars for r in out.values()) == 450


def test_unimax_invariants_on_fixture(spark):
    """Fixture-level invariants: every allocation ≤ its cap, epochs ≤ the
    cap in bp, total allocation ≤ budget (floor loses < m chars), and the
    fully-allocated set is a capacity-prefix."""
    from alertas_spark.operators.sampling import (UNIMAX_BUDGET_PCT,
                                                  UNIMAX_EPOCH_CAP)

    rows = sorted(_run(spark, "dataset_mix_unimax").collect(),
                  key=lambda r: (r.cap_chars, r.source or ""))
    assert rows
    b = sum(r.n_s for r in rows) * UNIMAX_BUDGET_PCT // 100
    total = sum(r.alloc_chars for r in rows)
    assert b - len(rows) < total <= b
    seen_partial = False
    for r in rows:
        assert r.alloc_chars <= r.cap_chars
        assert r.epochs_bp <= UNIMAX_EPOCH_CAP * 10000
        if r.alloc_chars < r.cap_chars:
            seen_partial = True
        else:
            assert not seen_partial, "full allocation after a partial one"


# ---------------------------------------------------------------------------
# dataset_mix_doremi: MW trajectory properties
# ---------------------------------------------------------------------------


def test_doremi_eta_zero_stays_uniform(spark):
    """The uniform-initialization contract: with η = 0 every domain's
    multiplier is exactly 1e5, so renormalization returns the uniform share
    and smoothing mixes uniform with uniform — the trajectory must stay at
    1000000 div m through every round, bit-exactly."""
    from alertas_spark.operators.sampling import _doremi

    rows = _doremi(spark, SF, 0.0).collect()
    assert rows
    u = 1000000 // len(rows)
    assert all(r.alpha_fp == u for r in rows)


def test_doremi_weights_monotone_in_excess_and_conserved(spark):
    """Higher excess loss ⇒ weight ≥ that of any lower-excess domain (the
    MW update is monotone in qexp and order-preserving across rounds from a
    uniform start), every weight ≥ the smoothing floor, and the floors lose
    at most a few units of 1e-6 mass per domain per round."""
    rows = sorted(_run(spark, "dataset_mix_doremi").collect(),
                  key=lambda r: (r.excess_q, r.source or ""))
    assert rows
    m = len(rows)
    for lo, hi in zip(rows, rows[1:]):
        if hi.excess_q > lo.excess_q:
            assert hi.alpha_fp >= lo.alpha_fp
    from alertas_spark.operators.sampling import (DOREMI_ITERS,
                                                  DOREMI_SMOOTH_FP)

    floor = DOREMI_SMOOTH_FP * (1000000 // m) // 1000000
    assert all(r.alpha_fp >= floor for r in rows)
    total = sum(r.alpha_fp for r in rows)
    assert 1000000 - (DOREMI_ITERS + 1) * 2 * m <= total <= 1000000
    assert all(r.weight_bp == r.alpha_fp // 100 for r in rows)


def test_minkprob_partial_boundary_slice_hand_computed(spark, tmp_path):
    """The bottom-k% cut must take an exact PARTIAL slice of the boundary
    type.  Corpus: doc1 = a×4 b×4 c×2, doc2 = a×3 b×7 → counts a=7, b=11,
    c=2, N=20.  doc2 has n=10, k=2; its rarest type is a (dc=3), so the cut
    takes 2 of the 3 'a' occurrences mid-type and Min-K% = ln(20/7).
    doc1's cut takes all of c (dc=2) exactly: Min-K% = ln(20/2)."""
    import math

    import pandas as pd

    from alertas_spark.registry import load_all

    df = pd.DataFrame(
        [(1, "a a a a b b b b c c", "en", "s", 19),
         (2, "a a a b b b b b b b", "en", "s", 19)],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    df.to_parquet(tmp_path / "documents.parquet")
    out = {r.doc_id: r for r in
           load_all()["decontaminate_minkprob"]
           .builder(spark, str(tmp_path)).collect()}
    assert out[1].n_tokens == 10 and out[1].k_tokens == 2
    assert out[1].mink_nats == round(math.log(20 / 2), 6)
    assert out[2].mink_nats == round(math.log(20 / 7), 6)
    # both well under τ on this tiny corpus → flagged as members
    assert out[1].member_flag == 1 and out[2].member_flag == 1


def test_lr_calibration_buckets_partition_the_fold(spark):
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    pred = load_all()["lr_quality_score"].builder(spark, sf).collect()
    cal = load_all()["lr_calibration_curve"].builder(spark, sf).collect()
    assert sum(r.n for r in cal) == len(pred)
    for r in cal:
        assert 0 <= r.bucket <= 9
        assert 0.0 <= r.obs_rate <= 1.0
        # bucket mean prediction sits inside the bucket's range
        assert r.bucket / 10 <= r.avg_pred <= min((r.bucket + 1) / 10, 1.0)


def test_decontaminate_minhash_catches_edited_eval_leakage(spark, tmp_path):
    """An eval document and a training twin with ONE word changed (exact
    5-gram screens weaken, near-dup survives): the pair must be flagged
    with the hand-computable shingle Jaccard; an unrelated doc must not."""
    import pandas as pd

    from alertas_spark.operators.dedup import MH_DECON_MOD, MH_DECON_TAU
    from alertas_spark.registry import load_all

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    edited = base.replace("kilo", "xray")
    rows = [
        (0, base, "en", "s"),                       # eval (0 % 13 == 0, < cap)
        (1, edited, "en", "s"),                     # training near-dup
        (2, "one two three four five six", "en", "s"),  # unrelated training
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    out = load_all()["decontaminate_minhash"] \
        .builder(spark, str(tmp_path)).collect()
    assert {(r.doc_id, r.eval_id) for r in out} == {(1, 0)}
    # hand Jaccard: 18 words → 16 trigram shingles each; changing word 11
    # kills shingles 9,10,11 in each → 13 common / (16+16−13) = 13/19
    assert out[0].jaccard == round(13 / 19, 6)
    assert out[0].jaccard >= MH_DECON_TAU
    assert 0 % MH_DECON_MOD == 0  # doc 0 really is the eval slice


def test_countmin_no_underestimate_and_collisions_exercised(spark):
    """The CMS contracts on the real fixture: est >= exact for EVERY token
    (no-underestimate identity), and at the shipped D x W the fixture
    vocabulary exceeds W so collisions actually occur — the overestimate
    branch is live, not vacuously green."""
    from alertas_spark.operators.countmin import CM_W
    from alertas_spark.registry import load_all

    row = load_all()["countmin_overestimate_audit"] \
        .builder(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_underestimated == 0
    assert row.n_tokens > CM_W  # the 31-word fixture pool exceeds W=16...
    assert row.n_overestimated > 0  # ...so collision mass is observed
    assert row.max_overestimate > 0


def test_countmin_estimate_is_min_of_cells(spark):
    """Hand-check the sketch algebra on a 3-token corpus: every token's
    estimate equals the minimum of its D cells, and a token colliding with
    another in SOME row still reports exactly when any row separates it."""
    import pandas as pd

    from alertas_spark.operators.countmin import _cm_est

    # build a tiny corpus: 'aa' x3, 'bb' x2, 'cc' x1
    df = pd.DataFrame({
        "doc_id": [0], "text": ["aa aa aa bb bb cc"],
        "lang": ["en"], "source": ["s"], "n_chars": [17]})
    import tempfile, os
    d = tempfile.mkdtemp()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    est = {r.t: (r.est, r.exact) for r in _cm_est(spark, d).collect()}
    assert est.keys() == {"aa", "bb", "cc"}
    assert all(e >= x for e, x in est.values())
    # with 3 tokens in W=1024 buckets x 3 rows, a full 3-way collision in
    # every row has probability ~(3/1024)^3 — the exact branch is the norm
    assert est["aa"][1] == 3 and est["bb"][1] == 2 and est["cc"][1] == 1


def test_concat_chunk_spans_conserve_tokens_and_fill_packs(spark):
    """Span-relation invariants on the real fixture: (a) each document's
    span contributions sum to its token count, (b) every pack except each
    shard's tail holds exactly PACK_BUDGET tokens (zero padding waste by
    construction), (c) the audit's split count equals the span relation's."""
    from collections import defaultdict

    from alertas_spark.operators.packing import PACK_BUDGET
    from alertas_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    spans = load_all()["pack_concat_chunk_spans"].builder(spark, sf).collect()
    audit = {r.source: r for r in
             load_all()["pack_concat_audit"].builder(spark, sf).collect()}
    per_doc = defaultdict(int)
    per_pack = defaultdict(int)
    last_pack = {}
    for r in spans:
        per_doc[r.doc_id] += r.n_in_pack
        per_pack[(r.source, r.pack_id)] += r.n_in_pack
        last_pack[r.source] = max(last_pack.get(r.source, -1), r.pack_id)
    toks = {r.doc_id: r.n_tokens for r in
            load_all()["pack_sequences"].builder(spark, sf).collect()
            if r.n_tokens > 0}
    assert per_doc == toks  # token conservation
    for (src, p), n in per_pack.items():
        if p < last_pack[src]:
            assert n == PACK_BUDGET, (src, p, n)  # full packs, zero padding
        else:
            assert 0 < n <= PACK_BUDGET
    split_docs = {r.doc_id for r in spans if r.is_split}
    for src, a in audit.items():
        got = len({r.doc_id for r in spans if r.is_split and r.source == src})
        assert got == a.n_split_docs, (src, got, a.n_split_docs)
    assert split_docs  # the fixture actually exercises boundary splits
