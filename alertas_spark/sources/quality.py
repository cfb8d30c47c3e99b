"""Row-level data-quality audit: declarative constraint rules → violation counts.

Complements the schema-level contract check (`sources/contracts.py`, which reads
only parquet footers) with the row-level half a production boundary needs:
null checks, domain checks, range checks, and referential integrity, each a
named rule with a violation count.

Scale shape: every intra-row rule folds into ONE conditional-aggregation pass
over the fact table (no per-rule rescans); referential integrity is a single
left-anti join (AQE broadcasts the dim side when it fits).  The output is one
tiny row per rule — the shape a scheduler gates a 100 TB load on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from alertas_spark.registry import declare
from alertas_spark.sources.catalog import load_table

#: intra-row rules over orders: name → SQL boolean (TRUE = violation).
#: `orderdate_before_1996` is a freshness-window rule that genuinely fires on
#: the fixture (order dates span 1995-2001) so the audit is pinned non-trivially.
ORDER_RULES: dict[str, str] = {
    "nonpositive_totalprice": "o_totalprice <= 0",
    "null_orderdate": "o_orderdate IS NULL",
    "orderdate_before_1996": "o_orderdate < TIMESTAMP '1996-01-01'",
    "bad_status": "o_orderstatus NOT IN ('F', 'O', 'P')",
}


@declare(
    "dq_audit_orders",
    oracle=f"""
    SELECT 'nonpositive_totalprice' AS rule,
           COUNT(*) FILTER (WHERE {ORDER_RULES['nonpositive_totalprice']})
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'null_orderdate',
           COUNT(*) FILTER (WHERE {ORDER_RULES['null_orderdate']}) FROM orders
    UNION ALL
    SELECT 'orderdate_before_1996',
           COUNT(*) FILTER (WHERE {ORDER_RULES['orderdate_before_1996']})
    FROM orders
    UNION ALL
    SELECT 'bad_status',
           COUNT(*) FILTER (WHERE {ORDER_RULES['bad_status']}) FROM orders
    UNION ALL
    SELECT 'fk_custkey_missing', COUNT(*)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'total_rows', COUNT(*) FROM orders
    """,
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over orders: 4 intra-row rules in one conditional-agg
    pass, FK integrity vs customer as one left-anti join, plus the checked-row
    total — one (rule, n_violations) row each."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    pairs = ", ".join(
        f"named_struct('rule', '{name}', 'n_violations', "
        f"count_if({cond}))" for name, cond in ORDER_RULES.items())
    intra = (orders.agg(F.expr(f"array({pairs}, named_struct("
                               f"'rule', 'total_rows', 'n_violations', count(1)))")
                        .alias("rules"))
             .select(F.explode("rules").alias("r"))
             .select("r.rule", "r.n_violations"))
    fk = (orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
          .agg(F.lit("fk_custkey_missing").alias("rule"),
               F.count(F.lit(1)).alias("n_violations")))
    return intra.unionByName(fk)


def write_with_audit(df: DataFrame, path: str,
                     metrics: dict[str, Column]) -> dict:
    """Write ``df`` as parquet while collecting audit metrics IN THE SAME
    PASS via ``df.observe`` — the production DQ shape for sinks: a nightly
    publish at 100 TB cannot afford a second full scan just to count
    violations, and a separately-computed audit can silently diverge from
    what was actually written (the write and the audit must see the same
    rows).  ``metrics`` maps output name → aggregate Column (count_if-style
    conditional counters compose freely).  Returns the observed metric dict
    after the write completes."""
    from pyspark.sql import Observation

    obs = Observation()
    (df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
       .write.mode("overwrite").parquet(path))
    return obs.get
