"""Aggregation operators (SURVEY §2.4).

Covers: A1/A2 multi-agg with aliases, A3 multi-key GROUP BY, A4 HAVING on aggregate,
A5 COUNT(1), A6 COUNT(DISTINCT), A7 MIN/MAX over strings, A8 product via EXP(SUM(LN)),
A9 collect_list + concat_ws (made deterministic with array_sort), A10 conditional
aggregation, A11 global aggregate.

Scale notes: all hash aggregates do map-side partial aggregation before the shuffle
(Spark default); doubles are accumulated as DECIMAL (order-independent ⇒ identical on 1
or 1000 executors — see functions/numeric.py).  COUNT(DISTINCT) is exact here; at
100 TB prefer approx_count_distinct (documented option, SURVEY §2.4 A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from alertas_spark.functions.numeric import finite
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: A1/A2/A3/A5 — the engine's headline scan+aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@declare(
    "product_aggregate",
    oracle="""
    SELECT l_orderkey,
           ROUND(EXP(SUM(CAST(ROUND(LN(1 - l_discount) * 1e9) AS BIGINT)) / 1e9),
                 6) AS keep_factor,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_orderkey % 97 = 0 AND l_discount < 1.0
    GROUP BY l_orderkey
    """,
)
def product_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: product aggregate via EXP(SUM(LN(x))) (≙ penalty multiplier factor
    alerta_prcr.py:54).  Each LN term is quantized to a fixed-point bigint
    (1e-9 units) before summing: double addition is not associative, so a raw
    SUM of doubles depends on partitioning/merge order and a 6-decimal round
    can straddle across engines or re-runs (observed at sf0.1) — the integer
    sum is exact and order-independent, making the aggregate idempotent under
    re-partitioning (a 100 TB determinism requirement; cf.
    tests/test_partition_invariance.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    ln_fixed = F.round(F.log(1 - F.col("l_discount")) * 1e9).cast("bigint")
    return (
        li.filter((F.col("l_orderkey") % 97 == 0) & (F.col("l_discount") < 1.0))
        .groupBy("l_orderkey")
        .agg(
            F.round(F.exp(F.sum(ln_fixed) / 1e9), 6).alias("keep_factor"),
            F.count("*").alias("n_items"),
        )
    )


@declare(
    "collect_sorted_concat",
    oracle="""
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 350000
    GROUP BY o_custkey
    """,
)
def collect_sorted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: collect_list + concat_ws, with array_sort for determinism (the reference's
    version is order-nondeterministic — alerta_prcr.py:54; SURVEY §2.4 A9)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))))
            .alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
    )


@declare(
    "having_conditional_agg",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           strftime(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END),
                    '%Y-%m-%d') AS last_urgent
    FROM orders
    GROUP BY o_custkey
    HAVING MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 0 AND COUNT(*) >= 3
    """,
)
def having_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 HAVING-on-aggregate + A10 MAX(CASE WHEN...) conditional aggregation
    (≙ HAVING MAX(flag_conversao)=0 alerta_nf30.py:62; conditional max :40-47)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.date_format(
                F.max(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_orderdate"))),
                "yyyy-MM-dd").alias("last_urgent"),
            F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("_any_open"),
        )
        .filter((F.col("_any_open") == 0) & (F.col("n_orders") >= 3))
        .drop("_any_open")
    )


@declare(
    "count_distinct_segments",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_customers,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def count_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact COUNT(DISTINCT) (≙ alerta_ro.py:35-36).  At 100 TB swap to
    approx_count_distinct — exact distinct is a two-phase shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"),
             F.countDistinct("c_mktsegment").alias("n_segments"))
    )


@declare(
    "minmax_strings",
    oracle="""
    SELECT lang,
           MIN(source) AS min_source, MAX(source) AS max_source,
           MIN(substr(text, 1, 24)) AS min_prefix,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def minmax_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: MIN/MAX over strings (≙ serial-number min/max alerta_ro.py:30-34)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.min("source").alias("min_source"),
        F.max("source").alias("max_source"),
        F.min(F.substring("text", 1, 24)).alias("min_prefix"),
        F.count("*").alias("n_docs"),
    )


@declare(
    "global_aggregate",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           {sql_dsum('l_extendedprice')} AS total_price,
           ROUND(MIN(l_discount), 2) AS min_disc,
           ROUND(MAX(l_discount), 2) AS max_disc
    FROM lineitem
    """,
)
def global_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: ungrouped global aggregate (≙ MAX(ano_referencia) alerta_isps.py:38-42)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_discount"), 2).alias("max_disc"),
    )


@declare(
    "order_value_percentiles",
    oracle="""
    SELECT c_mktsegment,
           ROUND(quantile_cont(v, 0.5), 4) AS p50,
           ROUND(quantile_cont(v, 0.9), 4) AS p90,
           ROUND(quantile_cont(v, 0.99), 4) AS p99
    FROM (SELECT c_mktsegment,
                 CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS v
          FROM orders JOIN customer ON o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (p50/p90/p99) of order value per market
    segment — ``percentile()``, Spark's exact linear-interpolation aggregate
    (the same continuous-quantile definition as the oracle's
    ``quantile_cont``), not ``approx_percentile``.

    Scale note: exact percentiles buffer each group's values, so this is the
    small-group-count shape (5 segments); for high-cardinality groups or
    full-table profiles the sketch path (``profile_columns_approx``,
    operators/profiling.py) is the 100 TB default — the two queries pin both
    tiers."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    # finite gate: Spark's percentile and DuckDB's quantile_cont disagree on
    # where NaN sorts in the interpolation — an order statistic is only
    # defined over finite values (NULLs are skipped identically by both)
    pct = F.percentile(finite(F.col("o_totalprice")), F.lit([0.5, 0.9, 0.99]))
    return (j.groupBy("c_mktsegment")
            .agg(pct.alias("ps"))
            .select("c_mktsegment",
                    F.round(F.col("ps")[0], 4).alias("p50"),
                    F.round(F.col("ps")[1], 4).alias("p90"),
                    F.round(F.col("ps")[2], 4).alias("p99")))


@declare(
    "price_histogram_width_bucket",
    oracle="""
    WITH f AS (SELECT o_orderstatus,
                      CASE WHEN isfinite(o_totalprice) THEN o_totalprice END
                          AS o_totalprice
               FROM orders),
    b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
               FROM f)
    -- DuckDB has no width_bucket; this is Spark's exact evaluation order
    -- (catalyst WidthBucket: multiply THEN divide — (n * (v - lo)) / (hi - lo)
    -- + 1, NOT (v - lo) / ((hi - lo) / n): the two float associations can
    -- disagree on values sitting exactly on a bucket edge);
    -- v < lo -> 0, v >= hi -> n + 1
    SELECT o_orderstatus,
           CAST(CASE WHEN o_totalprice < lo THEN 0
                     WHEN o_totalprice >= hi THEN 11
                     ELSE FLOOR(10 * (o_totalprice - lo) / (hi - lo)) + 1
                END AS INTEGER) AS bucket,
           COUNT(*) AS n
    FROM f, b
    GROUP BY 1, 2
    """,
)
def price_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 10-bucket histogram of order value per status via
    ``width_bucket`` against the observed global [min, max] — the one-pass
    histogram shape (bounds from a 1-row aggregate riding in via the
    broadcast-crossJoin idiom J7, bucketing + count in a single distributed
    aggregate; both engines share the same width_bucket edge semantics,
    including hi landing in the overflow bucket n+1)."""
    # finite gate on the measured value: a NaN totalprice would poison the
    # MAX bound (Spark sorts NaN greatest) and bucket every row into garbage;
    # the NaN row itself gets a NULL bucket on both engines
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_totalprice", finite(F.col("o_totalprice")))
    bounds = orders.agg(F.min("o_totalprice").alias("lo"),
                        F.max("o_totalprice").alias("hi"))
    return (orders.crossJoin(F.broadcast(bounds))
            .groupBy("o_orderstatus",
                     F.width_bucket("o_totalprice", "lo", "hi", F.lit(10))
                      .cast("int").alias("bucket"))
            .agg(F.count("*").alias("n")))


@declare(
    "regr_price_vs_quantity",
    oracle="""
    WITH p AS (
        SELECT l_returnflag AS flag,
               l_quantity AS x, l_extendedprice AS y,
               l_quantity * l_extendedprice AS xy,
               l_quantity * l_quantity AS xx,
               l_extendedprice * l_extendedprice AS yy
        FROM lineitem
        WHERE isfinite(l_quantity) AND isfinite(l_extendedprice)
    ), m AS (
        SELECT flag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(x AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(y AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(xy AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(CAST(xx AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(yy AS DECIMAL(29,6))) AS VARCHAR) AS DOUBLE) AS syy
        FROM p GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
               AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))
                  * sx) / n, 6) AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6)
               AS r2
    FROM m
    """,
)
def regr_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (slope / intercept / R²) of line
    price against quantity — the DETERMINISTIC distributed formulation.

    Spark ships ``regr_slope``/``corr``, but their co-moment accumulators
    merge in partition order (Welford-style), so the last bits differ between
    runs, partitionings, and engines.  Instead the five raw moments
    Σx, Σy, Σxy, Σx², Σy² accumulate through the decimal contract
    (per-row products stay IEEE-double — bit-identical on both engines — and
    the decimal sums are order-independent), then the closed-form slope /
    intercept / R² is a handful of double ops on identical inputs: the result
    is bit-equal under ANY partitioning, pinned against DuckDB.

    Scale shape: one map-side-combined hash aggregate — regression over a
    100 TB fact table costs exactly one scan + one tiny shuffle, like any
    grouped sum.  Pairs with NULL/non-finite coordinates are excluded
    (standard regr_* semantics + the finite-domain contract).  Decimal
    headroom: x² terms up to ~1e10 leave 10¹³ row-count headroom in
    DECIMAL(29,6)."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    p = (li.filter(finite(x).isNotNull() & finite(y).isNotNull())
         .select(F.col("l_returnflag").alias("flag"),
                 x.alias("x"), y.alias("y"),
                 (x * y).alias("xy"), (x * x).alias("xx"),
                 (y * y).alias("yy")))

    def dmom(c: str) -> F.Column:
        return F.sum(F.col(c).cast("decimal(29,6)")).cast("double")

    m = p.groupBy("flag").agg(
        F.count("*").cast("double").alias("n"),
        dmom("x").alias("sx"), dmom("y").alias("sy"),
        dmom("xy").alias("sxy"), dmom("xx").alias("sxx"),
        dmom("yy").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n, var_n = n * sxy - sx * sy, n * sxx - sx * sx
    # try_divide: a degenerate group (single pair, or constant x) has zero
    # variance — slope/R² are undefined there (NULL), and ANSI mode errors
    # even on double division by zero
    slope = F.try_divide(cov_n, var_n)
    return m.select(
        "flag", n.cast("bigint").alias("n_pairs"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(F.try_divide(cov_n * cov_n,
                             var_n * (n * syy - sy * sy)), 6).alias("r2"))


@declare(
    "weighted_median_price_by_flag",
    oracle="""
    WITH p AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               SUM(CAST(l_quantity AS DECIMAL(29,6))) AS w
        FROM lineitem
        WHERE isfinite(l_extendedprice) AND isfinite(l_quantity)
          AND l_quantity > 0
        GROUP BY 1, 2
    ), c AS (
        SELECT flag, price, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY price
                            ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(w) OVER (PARTITION BY flag) AS tot
        FROM p
    )
    SELECT flag, MIN(price) AS weighted_median,
           CAST(CAST(MIN(tot) AS VARCHAR) AS DOUBLE) AS total_weight
    FROM c WHERE cumw + cumw >= tot GROUP BY flag
    """,
)
def weighted_median_price_by_flag(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """WEIGHTED (lower) median — the order statistic neither engine ships as
    a weighted built-in: per return flag, the smallest price whose cumulative
    quantity-weight reaches half the total.  The construction is exact and
    order-independent everywhere it matters: weights aggregate per distinct
    price in exact decimal (ties collapse before the scan), the cumulative
    sum runs over the unambiguous ``price`` ordering, and the half-total test
    ``2·cumw ≥ tot`` compares exact decimals — no float accumulation, so the
    selected median is bit-identical across engines and partitionings.

    Scale shape: one map-side-combined aggregation on (flag, price), one
    window shuffle on flag — at 100 TB the per-flag ordering is the
    unavoidable cost of any exact order statistic, and the per-distinct-value
    pre-aggregation bounds the window input by value cardinality, not row
    count.  Zero/negative/non-finite weights and non-finite prices are
    excluded (finite-domain contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    p = (li.filter(finite(price).isNotNull() & finite(qty).isNotNull()
                   & (qty > 0))
         .groupBy(F.col("l_returnflag").alias("flag"),
                  price.alias("price"))
         .agg(F.sum(qty.cast("decimal(29,6)")).alias("w")))
    from pyspark.sql import Window

    cum = Window.partitionBy("flag").orderBy("price") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("flag")
    c = p.select(
        "flag", "price",
        F.sum("w").over(cum).alias("cumw"),
        F.sum("w").over(tot).alias("tot"))
    # cumw+cumw, not 2*cumw: doubling by ADDITION stays inside both
    # engines' decimal width cap (38); a decimal×int product would
    # need precision 39 and falls out of exact decimal space
    return (c.filter(F.col("cumw") + F.col("cumw") >= F.col("tot"))
            .groupBy("flag")
            .agg(F.min("price").alias("weighted_median"),
                 F.min("tot").cast("double").alias("total_weight")))


@declare(
    "event_type_entropy_per_user",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS c,
               CAST(ROUND(LN(COUNT(*)) * 1e9) AS BIGINT) AS qc
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2
    ), u AS (
        SELECT user_id, SUM(c) AS n, COUNT(*) AS n_types,
               SUM(CAST(c AS HUGEINT) * qc) AS s
        FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(n_types AS INTEGER) AS n_types,
           ROUND(CAST(CAST(CAST(n AS HUGEINT)
                           * CAST(ROUND(LN(n) * 1e9) AS BIGINT) - s
                      AS VARCHAR) AS DOUBLE) / n / 1e9, 6) AS entropy_nats
    FROM u
    """,
)
def event_type_entropy_per_user(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the behavioral
    diversity statistic (and the A8 quantized-ln idiom applied to a
    *composite* log expression): H = ln(n) − (Σ cᵢ·ln cᵢ)/n, with every ln
    term quantized to 1e-9-unit bigints BEFORE any arithmetic, so the
    numerator n·Q(n) − Σ cᵢ·Q(cᵢ) accumulates in exact integers (decimal(38)
    headroom for 100 TB counts) and is identical under any partitioning; the
    single closing double division is correctly rounded on both engines (the
    DuckDB side converts the exact numerator through VARCHAR per the decimal
    contract).

    Scale shape: two map-side-combined hash aggregations — (user, type) then
    user — i.e. entropy over any cardinality costs the same as two grouped
    counts.  NULL types/users are excluded (a NULL category has no count
    semantics; documented domain contract)."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type").isNotNull()
                   & F.col("user_id").isNotNull())
         .groupBy("user_id", "event_type")
         .agg(F.count("*").alias("c")))
    qc = F.round(F.log("c") * 1e9).cast("bigint")
    u = c.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count("*").cast("int").alias("n_types"),
        F.sum(F.col("c").cast("decimal(38,0)") * qc).alias("s"))
    qn = F.round(F.log("n") * 1e9).cast("bigint")
    numer = (F.col("n").cast("decimal(38,0)") * qn - F.col("s")).cast("double")
    return u.select(
        F.col("user_id"),
        F.col("n").cast("bigint").alias("n_events"),
        "n_types",
        F.round(numer / F.col("n") / 1e9, 6).alias("entropy_nats"))
