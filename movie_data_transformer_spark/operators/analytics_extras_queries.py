"""Round-6 analytics extensions: two period-comparison reports in exact
integer arithmetic.

- `events_topk_movers`: period-over-period activity change per user —
  split the corpus at its midpoint day, count each user's events per
  half, rank the largest absolute changes (exact integer delta;
  ties on (|delta| desc, user_id) are total). The week-over-week "what
  changed" report every ops dashboard runs.
- `orders_abc_classification`: ABC inventory analysis — parts ranked by
  exact-cents revenue, cumulative share in floor micro, class A/B/C at
  the 80% / 95% cumulative cuts, rolled up per class. The cumulative
  window runs over the part dimension (small); revenue aggregation is
  the only data-sized shuffle.

Both FULL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

TOP_MOVERS = 20


def q_events_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_mv_events")
    return spark.sql(
        f"""
        WITH days AS (
            SELECT user_id, unix_timestamp(ts) DIV 86400 AS day_idx
            FROM _mv_events
        ),
        bounds AS (
            SELECT (min(day_idx) + max(day_idx)) DIV 2 AS mid FROM days
        ),
        halves AS (
            SELECT user_id,
                   CAST(count(CASE WHEN day_idx <= mid THEN 1 END) AS BIGINT)
                       AS n_h1,
                   CAST(count(CASE WHEN day_idx > mid THEN 1 END) AS BIGINT)
                       AS n_h2
            FROM days CROSS JOIN bounds
            GROUP BY user_id
        )
        SELECT user_id, n_h1, n_h2, n_h2 - n_h1 AS delta, rk
        FROM (
            SELECT *, CAST(row_number() OVER (
                ORDER BY abs(n_h2 - n_h1) DESC, user_id ASC) AS INT) AS rk
            FROM halves
        )
        WHERE rk <= {TOP_MOVERS}
        """
    )


SQL_EVENTS_TOPK_MOVERS = f"""
WITH days AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
    FROM events
),
bounds AS (SELECT (min(day_idx) + max(day_idx)) // 2 AS mid FROM days),
halves AS (
    SELECT user_id,
           CAST(count(CASE WHEN day_idx <= mid THEN 1 END) AS BIGINT) AS n_h1,
           CAST(count(CASE WHEN day_idx > mid THEN 1 END) AS BIGINT) AS n_h2
    FROM days CROSS JOIN bounds
    GROUP BY user_id
)
SELECT user_id, n_h1, n_h2, n_h2 - n_h1 AS delta, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        ORDER BY abs(n_h2 - n_h1) DESC, user_id ASC) AS rk
    FROM halves
)
WHERE rk <= {TOP_MOVERS}
"""


def q_orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_abc_li")
    return spark.sql(
        """
        WITH rev AS (
            SELECT l_partkey,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev_cents
            FROM _abc_li GROUP BY l_partkey
        ),
        ranked AS (
            SELECT l_partkey, rev_cents,
                   sum(rev_cents) OVER (ORDER BY rev_cents DESC,
                       l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
                       CURRENT ROW) AS cum_cents,
                   sum(rev_cents) OVER () AS total_cents
            FROM rev
        ),
        classed AS (
            SELECT l_partkey, rev_cents,
                   CASE WHEN cum_cents * 1000000 DIV total_cents <= 800000
                        THEN 'A'
                        WHEN cum_cents * 1000000 DIV total_cents <= 950000
                        THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM ranked
        )
        SELECT abc_class,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents
        FROM classed GROUP BY abc_class
        """
    )


SQL_ORDERS_ABC_CLASSIFICATION = """
WITH rev AS (
    SELECT l_partkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, rev_cents,
           CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC,
               l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS BIGINT) AS cum_cents,
           CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
    FROM rev
),
classed AS (
    SELECT l_partkey, rev_cents,
           CASE WHEN cum_cents * 1000000 // total_cents <= 800000 THEN 'A'
                WHEN cum_cents * 1000000 // total_cents <= 950000 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents
FROM classed GROUP BY abc_class
"""


def q_orders_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    YEAR, revenue accumulated per years-since-acquisition — the
    financial complement of retention_cohorts (which counts users at
    fixed ages). Exact cents; two shuffles (first-order agg + triangle
    grain)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ltv_orders")
    return spark.sql(
        """
        WITH first_order AS (
            SELECT o_custkey, min(year(o_orderdate)) AS cohort_year
            FROM _ltv_orders GROUP BY o_custkey
        )
        SELECT f.cohort_year,
               year(o.o_orderdate) - f.cohort_year AS age_years,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
               CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS rev_cents
        FROM _ltv_orders o JOIN first_order f ON o.o_custkey = f.o_custkey
        GROUP BY f.cohort_year, year(o.o_orderdate) - f.cohort_year
        """
    )


SQL_ORDERS_COHORT_LTV_TRIANGLE = """
WITH first_order AS (
    SELECT o_custkey, min(year(o_orderdate)) AS cohort_year
    FROM orders GROUP BY o_custkey
)
SELECT f.cohort_year,
       year(o.o_orderdate) - f.cohort_year AS age_years,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
       CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
           AS BIGINT)) AS BIGINT) AS rev_cents
FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
GROUP BY f.cohort_year, year(o.o_orderdate) - f.cohort_year
"""


QUERIES = {
    "events_topk_movers": (q_events_topk_movers, SQL_EVENTS_TOPK_MOVERS),
    "orders_abc_classification": (
        q_orders_abc_classification,
        SQL_ORDERS_ABC_CLASSIFICATION,
    ),
    "orders_cohort_ltv_triangle": (
        q_orders_cohort_ltv_triangle,
        SQL_ORDERS_COHORT_LTV_TRIANGLE,
    ),
}
