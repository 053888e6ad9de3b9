"""Registry entry for the one-pass table profiler (on orders)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.profile import profile_table
from movie_data_transformer_spark.sources.tables import load_table

_ORDERS_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),  # timestamp: profiled but no numeric range
    ("o_orderpriority", False),
]


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "orders"))


def _profile_orders_sql() -> str:
    parts = []
    for col, numeric in _ORDERS_COLS:
        mn = f"CAST(min({col}) AS VARCHAR)" if numeric else "NULL"
        mx = f"CAST(max({col}) AS VARCHAR)" if numeric else "NULL"
        parts.append(
            f"""SELECT '{col}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       {mn} AS min_val, {mx} AS max_val
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectations, evaluated as one report:
    key uniqueness, column completeness, referential integrity, and a
    domain constraint — each row is (constraint, n_checked, n_violations,
    passed). The suite compiles to THREE fact scans total: one scan of
    orders carries uniqueness + completeness + the customer FK (the
    orphan flag rides a broadcast left join, the three counts are
    partials of one aggregate), one scan of lineitem carries its FK +
    domain bounds the same way (the orders keys shuffle-join at scale —
    that side is the second, key-only orders scan), and the fixed-size
    report explodes from the two 1-row aggregates. The naive
    one-aggregate-per-rule form scanned orders five times and lineitem
    three."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    o_agg = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n"),
            (F.count("*") - F.countDistinct("o_orderkey")).alias("dups"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("orphans"),
        )
    )
    li_agg = (
        li.join(
            o.select(F.col("o_orderkey").alias("_ok")).distinct(),
            li.l_orderkey == F.col("_ok"),
            "left",
        )
        .agg(
            F.count("*").alias("n_li"),
            F.count(F.when(F.col("_ok").isNull(), 1)).alias("fk_viol"),
            F.count(
                F.when(
                    (F.col("l_quantity") <= 0)
                    | (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 1),
                    1,
                )
            ).alias("domain_viol"),
        )
    )
    return (
        o_agg.crossJoin(li_agg)
        .selectExpr(
            """explode(array(
                named_struct('check_name', 'orders_pk_unique',
                    'n_checked', n, 'n_violations', dups),
                named_struct('check_name', 'orders_custkey_complete',
                    'n_checked', n, 'n_violations', null_cust),
                named_struct('check_name', 'orders_custkey_fk',
                    'n_checked', n, 'n_violations', orphans),
                named_struct('check_name', 'lineitem_orderkey_fk',
                    'n_checked', n_li, 'n_violations', fk_viol),
                named_struct('check_name', 'lineitem_domain_bounds',
                    'n_checked', n_li, 'n_violations', domain_viol)
            )) AS r"""
        )
        .select("r.check_name", "r.n_checked", "r.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
    )


SQL_DQ_CONSTRAINT_REPORT = """
SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM (
    SELECT 'orders_pk_unique' AS check_name, count(*) AS n_checked,
           count(*) - count(DISTINCT o_orderkey) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_complete', count(*),
           count(*) FILTER (o_custkey IS NULL)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT count(*) FROM orders),
           count(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem),
           count(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_domain_bounds', count(*),
           count(*) FILTER (l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
    FROM lineitem
)
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics — the planning step BEFORE choosing
    a salting factor or AQE skew threshold at 100 TB: the 5 heaviest
    events.user_id keys with their corpus share and skew-vs-average
    ratio, both in exact integer micro-units (floor — midpoint-proof).
    skew_vs_avg_micro = freq / (n_rows / n_keys) computed as
    freq * n_keys * 1e6 DIV n_rows in DECIMAL/HUGEINT so it never
    rounds and never overflows.

    Scale: one shuffle (the per-key count); the global scalars are a
    map-side partial agg over the key table and the top-5 is a
    TakeOrdered, so nothing data-sized crosses a single partition. The
    key-count subtree appears under both consumers — the EXECUTED plan
    reuses the exchange (ReusedExchange at runtime; the static AQE plan
    shows two subtrees, probed)."""
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    glob = counts.agg(
        F.sum("freq").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    top5 = counts.orderBy(F.col("freq").desc(), F.col("user_id").asc()).limit(5)
    return (
        top5.crossJoin(F.broadcast(glob))
        .selectExpr(
            "user_id",
            "freq",
            "n_rows",
            "n_keys",
            "CAST(CAST(freq AS DECIMAL(38,0)) * 1000000 DIV n_rows AS BIGINT)"
            " AS share_micro",
            "CAST(CAST(freq AS DECIMAL(38,0)) * n_keys * 1000000 DIV n_rows"
            " AS BIGINT) AS skew_vs_avg_micro",
        )
    )


SQL_KEY_SKEW_PROFILE = """
WITH counts AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS freq FROM events GROUP BY 1
),
g AS (
    SELECT CAST(sum(freq) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM counts
),
top5 AS (
    SELECT user_id, freq FROM counts ORDER BY freq DESC, user_id ASC LIMIT 5
)
SELECT user_id, freq, n_rows, n_keys,
       CAST(CAST(freq AS HUGEINT) * 1000000 // n_rows AS BIGINT) AS share_micro,
       CAST(CAST(freq AS HUGEINT) * n_keys * 1000000 // n_rows AS BIGINT)
           AS skew_vs_avg_micro
FROM top5, g
"""


QUERIES = {
    "profile_orders": (q_profile_orders, _profile_orders_sql()),
    "dq_constraint_report": (q_dq_constraint_report, SQL_DQ_CONSTRAINT_REPORT),
    "key_skew_profile": (q_key_skew_profile, SQL_KEY_SKEW_PROFILE),
}
