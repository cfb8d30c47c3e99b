"""Join operators (SURVEY §2.3).

Covers: J1 inner equi chains, J2 left outer, J3 broadcast dims, J4 composite keys,
J5 range/theta conjuncts, J6 inequality self-join, J7/J8 cross join of a global
aggregate, J9 left anti, J10 disjunctive-key join (UNION ALL of equi joins), J11
greatest-n-per-group (window replaces the reference's agg+join-back), J12 left semi.

Scale notes: dims (nation/region/supplier) are broadcast — no shuffle of the fact side;
fact-fact joins shuffle on the join key and AQE handles skew.  The greatest-n-per-group
window shuffles ONCE on the partition key vs the reference's aggregate+join-back which
shuffles twice (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from alertas_spark.functions.numeric import dsum, sql_dsum
from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table


@declare(
    "revenue_by_nation",
    oracle=f"""
    SELECT n_name, r_name,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name, r_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi chain + J3 broadcast dims (≙ documento→vista→andamento chains
    alerta_bdpa.py:36-70; broadcast hints alerta_dctj.py:37-45)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@declare(
    "left_join_optional_dim",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           COALESCE(CAST(o_orderkey AS VARCHAR), 'NO_ORDER') AS first_order
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey AND n_regionkey = 2
    LEFT JOIN (
        SELECT o_custkey, MIN(o_orderkey) AS o_orderkey FROM orders
        WHERE o_totalprice > 450000 GROUP BY o_custkey
    ) big ON big.o_custkey = c_custkey
    WHERE c_custkey % 5 = 0
    """,
)
def left_join_optional_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left outer with condition in ON (J13) + null-producing dim
    (≙ optional classe/delegacia dims alerta_bdpa.py:28-34; ON-clause extra
    condition alerta_febt.py:38-39)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 450000)
        .groupBy("o_custkey").agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    return (
        cust.join(
            F.broadcast(nation),
            (cust.c_nationkey == nation.n_nationkey) & (nation.n_regionkey == 2),
            "left",
        )
        .join(big, big.o_custkey == cust.c_custkey, "left")
        .select(
            "c_custkey", "c_name", "n_name",
            F.coalesce(F.col("o_orderkey").cast("string"), F.lit("NO_ORDER")).alias("first_order"),
        )
    )


@declare(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: left anti join — replaces the reference's LEFT JOIN + IS NULL idiom
    (jobs.py:205-245; alerta_dctj.py:49-57)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey")


@declare(
    "semi_customers_with_big_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: left semi join (≙ existence filtering alerta_dt2i.py:45-67)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment")


@declare(
    "latest_order_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM (
        SELECT c_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM customer JOIN orders ON o_custkey = c_custkey
    ) t WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 greatest-n-per-group: single-shuffle window row_number replaces the
    reference's agg-max + composite-key join-back (alerta_bdpa.py:40-51,72-82;
    alerta_dord.py:24-31) — same result, one shuffle instead of two."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


@declare(
    "max_by_top_customer_per_nation",
    oracle="""
    SELECT n_name,
           arg_max(c_name, c_acctbal) AS top_customer,
           ROUND(MAX(c_acctbal), 2) AS top_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def max_by_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11/A12 alternative: ``max_by`` — the single-aggregation replacement for
    aggregate-then-self-join-back (SURVEY §2.4 A12)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("top_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_acctbal"),
        )
    )


@declare(
    "range_conjunct_late_shipments",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late_items,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))
                AS INTEGER) AS max_lag_days
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def range_conjunct_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: equi join with a range conjunct in ON — hash join on the equi key with the
    theta condition evaluated post-match (≙ returned-after-sent guia condition
    alerta_dctj.py:50-56)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY"))
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_late_items"),
            F.max(F.datediff(F.col("l_shipdate").cast("date"),
                             F.col("o_orderdate").cast("date"))).cast("int").alias("max_lag_days"),
        )
    )


@declare(
    "inequality_nation_pairs",
    oracle="""
    SELECT r_name, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region ON a.n_regionkey = r_regionkey
    """,
)
def inequality_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: self-join with inequality conjunct (≙ state-vs-municipality
    ``R.cod_mun != A.cod_mun`` alerta_isps.py:76,111)."""
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    region = load_table(spark, sf_dir, "region")
    return (
        a.join(b, (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
               & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
        .join(F.broadcast(region), F.col("a.n_regionkey") == region.r_regionkey)
        .select("r_name", F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))
    )


@declare(
    "cross_join_global_ratio",
    oracle="""
    WITH per_nation AS (
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    ), global AS (
        SELECT CAST(SUM(n_customers) AS DOUBLE) / COUNT(*) AS avg_customers FROM per_nation
    )
    SELECT n_name, n_customers,
           ROUND(n_customers / avg_customers, 6) AS ratio_to_avg
    FROM per_nation CROSS JOIN global
    """,
)
def cross_join_global_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (``ON 1=1`` attach-aggregate-to-all-rows, alerta_isps.py:149) + J8 explicit
    crossJoin (alerta_comp.py:36) + A11 global aggregate — the single-row aggregate is
    broadcast so no shuffle of the left side."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name").agg(F.count("*").alias("n_customers"))
    )
    glob = per_nation.agg(
        (F.sum("n_customers").cast("double") / F.count("*")).alias("avg_customers"))
    return per_nation.crossJoin(F.broadcast(glob)).select(
        "n_name", "n_customers",
        F.round(F.col("n_customers") / F.col("avg_customers"), 6).alias("ratio_to_avg"),
    )


@declare(
    "disjunctive_key_match",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS d FROM events
        WHERE event_type IN ('purchase', 'signup')
    ), pairs AS (
        SELECT a.event_id AS event_a, b.event_id AS event_b
        FROM purchases a JOIN purchases b
          ON a.user_id = b.user_id AND a.event_type = b.event_type
         AND a.event_id < b.event_id AND a.value < b.value
        UNION
        SELECT a.event_id, b.event_id
        FROM purchases a JOIN purchases b
          ON a.user_id = b.user_id AND a.d = b.d AND a.event_id < b.event_id
    )
    SELECT e.user_id, COUNT(*) AS n_pairs
    FROM pairs JOIN events e ON pairs.event_a = e.event_id
    GROUP BY e.user_id
    """,
)
def disjunctive_key_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: OR-of-key-sets match as UNION of equi joins + distinct — Spark cannot
    hash-join a disjunction, so each disjunct becomes its own shuffle-friendly equi
    join (≙ repeat-victim matching on 5 key sets alerta_mvvd.py:49-65, distinct :69)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    ).select("event_id", "user_id", "event_type", "value", F.col("ts").cast("date").alias("d"))
    a, b = ev.alias("a"), ev.alias("b")
    branch1 = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("a.value") < F.col("b.value")),
    ).select(F.col("a.event_id").alias("event_a"), F.col("b.event_id").alias("event_b"))
    branch2 = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.d") == F.col("b.d"))
        & (F.col("a.event_id") < F.col("b.event_id")),
    ).select(F.col("a.event_id").alias("event_a"), F.col("b.event_id").alias("event_b"))
    pairs = branch1.union(branch2).distinct()
    events = load_table(spark, sf_dir, "events")
    return (
        pairs.join(events, pairs.event_a == events.event_id)
        .groupBy("user_id").agg(F.count("*").alias("n_pairs"))
    )


@declare(
    "full_outer_daily_status_revenue",
    oracle=f"""
    WITH f AS (
        SELECT o_orderdate AS day, {sql_dsum('o_totalprice')} AS rev_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderdate
    ), o AS (
        SELECT o_orderdate AS day, {sql_dsum('o_totalprice')} AS rev_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderdate
    )
    SELECT strftime(COALESCE(f.day, o.day), '%Y-%m-%d') AS day, rev_f, rev_o
    FROM f FULL OUTER JOIN o ON f.day = o.day
    """,
)
def full_outer_daily_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse daily series (finalized vs open revenue):
    days where only one side traded keep the other side NULL — the one join
    type the rest of the corpus never exercises.  Both inputs are daily
    pre-aggregates, so the full-outer is calendar-bounded and co-partitioned
    on the join key (a sort-merge join with no broadcast side, matching how a
    full outer MUST execute at any scale — neither side can be streamed)."""
    orders = load_table(spark, sf_dir, "orders")

    def side(status: str, out: str) -> DataFrame:
        return (orders.filter(F.col("o_orderstatus") == status)
                .groupBy(F.col("o_orderdate").alias(f"day_{out}"))
                .agg(dsum(F.col("o_totalprice")).alias(f"rev_{out}")))

    f, o = side("F", "f"), side("O", "o")
    return (
        f.join(o, f.day_f == o.day_o, "full_outer")
        .select(F.date_format(F.coalesce("day_f", "day_o"), "yyyy-MM-dd")
                 .alias("day"), "rev_f", "rev_o")
    )
