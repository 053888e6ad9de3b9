"""SQL-semantics surface: multi-grain GROUPING SETS and the NOT IN
null-trap — two places where engines quietly differ and a migration off
the reference needs pinned behavior.

- `events_time_grain_rollup`: day/week/month revenue in ONE scan via
  GROUPING SETS, with grouping_id disambiguating the grain — the
  multi-grain OLAP rollup pattern (one shuffle produces all three grains
  vs three scans). Grain keys are serialized to strings on the output
  (a NULL day under the month grain is a grouping artifact, not data;
  the gid column carries the truth). Oracle: the literal UNION ALL of
  three aggregates — pinning that GROUPING SETS is exactly that.

- `sql_not_in_null_trap`: the classic three-valued-logic footgun. With a
  NULL planted in the subquery, `key NOT IN (subquery)` is UNKNOWN for
  every row (zero matches), while `NOT EXISTS` performs the real
  anti-join. One row carries all four variant counts (in / not_in /
  exists / not_exists), so BOTH engines' ANSI semantics are hash-bound
  — the entry a user hits the first time a nullable FK meets NOT IN.

Scale: the rollup is one shuffle wide as the union of grain keys (Spark
expands grouping sets map-side); the trap entry is two broadcast-sized
semi/anti joins and a 1-row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table


def q_events_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_ev_rollup")
    return spark.sql(
        """
        SELECT CAST(grouping_id(d, w, m) AS INT) AS gid,
               coalesce(CAST(d AS STRING), '') AS day,
               coalesce(CAST(w AS STRING), '') AS week,
               coalesce(CAST(m AS STRING), '') AS month,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_events
        FROM (SELECT value,
                     CAST(ts AS DATE) AS d,
                     CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w,
                     CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS m
              FROM _ev_rollup)
        GROUP BY GROUPING SETS ((d), (w), (m))
        """
    )


SQL_EVENTS_TIME_GRAIN_ROLLUP = """
WITH base AS (
    SELECT value,
           CAST(ts AS DATE) AS d,
           date_trunc('week', CAST(ts AS DATE)) AS w,
           date_trunc('month', CAST(ts AS DATE)) AS m
    FROM events
)
SELECT 3 AS gid, CAST(d AS VARCHAR) AS day, '' AS week, '' AS month,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM base GROUP BY d
UNION ALL
SELECT 5, '', CAST(w AS VARCHAR), '',
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM base GROUP BY w
UNION ALL
SELECT 6, '', '', CAST(m AS VARCHAR),
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM base GROUP BY m
"""


def q_sql_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("_trap_c")
    # subquery keys: customers with a MOD-3 subset of orders (so some
    # customers are genuinely absent and NOT EXISTS has rows to return),
    # PLUS one planted NULL (so NOT IN returns none — the trap)
    orders.filter("o_orderkey % 3 = 0").selectExpr(
        "o_custkey AS k"
    ).distinct().unionByName(
        spark.sql("SELECT CAST(NULL AS BIGINT) AS k")
    ).createOrReplaceTempView("_trap_k")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM _trap_c
           WHERE c_custkey IN (SELECT k FROM _trap_k)) AS n_in,
          (SELECT count(*) FROM _trap_c
           WHERE c_custkey NOT IN (SELECT k FROM _trap_k)) AS n_not_in,
          (SELECT count(*) FROM _trap_c c
           WHERE EXISTS (SELECT 1 FROM _trap_k t
                         WHERE t.k = c.c_custkey)) AS n_exists,
          (SELECT count(*) FROM _trap_c c
           WHERE NOT EXISTS (SELECT 1 FROM _trap_k t
                             WHERE t.k = c.c_custkey)) AS n_not_exists
        """
    )


SQL_SQL_NOT_IN_NULL_TRAP = """
WITH k AS (
    SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL SELECT CAST(NULL AS BIGINT)
)
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey IN (SELECT k FROM k)) AS n_in,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT k FROM k)) AS n_not_in,
  (SELECT count(*) FROM customer c
   WHERE EXISTS (SELECT 1 FROM k t WHERE t.k = c.c_custkey)) AS n_exists,
  (SELECT count(*) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM k t WHERE t.k = c.c_custkey))
      AS n_not_exists
"""


QUERIES = {
    "events_time_grain_rollup": (
        q_events_time_grain_rollup,
        SQL_EVENTS_TIME_GRAIN_ROLLUP,
    ),
    "sql_not_in_null_trap": (q_sql_not_in_null_trap, SQL_SQL_NOT_IN_NULL_TRAP),
}
