"""Spark 4 SQL LANGUAGE surfaces: pipe syntax and SQL scripting.

Two query-authoring surfaces added in Spark 4.0, each held to the
oracle of its classic-SQL twin so the new front-ends are hash-checked
against the engine's standard semantics:

- `sql_pipe_syntax`: the |> operator chain (FROM ... |> WHERE
  |> EXTEND |> AGGREGATE ... GROUP BY |> WHERE) — each stage consumes
  the previous stage's output top-down, compiling to the same logical
  plan as the nested classic form.
- `sql_scripting_rollup`: a BEGIN/DECLARE/WHILE script (compound
  statements, session variables, scalar-subquery SET) that accumulates
  per-bucket purchase totals across loop iterations — the procedural
  control-flow surface; the oracle is the single closed-form aggregate
  the loop must equal.

Scale: pipe syntax is pure syntax (identical Catalyst plan — zero
cost). Scripting runs one driver-compiled statement per iteration; the
loop here is 5 tiny aggregates (the pagerank-style bounded driver
probe), and anything data-sized inside a script body is still ordinary
distributed SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_pipe_events")
    return spark.sql(
        """
        FROM _pipe_events
        |> WHERE event_type = 'purchase'
        |> EXTEND CAST(value AS DECIMAL(18,4)) AS v
        |> AGGREGATE CAST(sum(v) AS DOUBLE) AS total,
                     CAST(count(*) AS BIGINT) AS n
           GROUP BY user_id
        |> WHERE n >= 2
        """
    )


SQL_SQL_PIPE_SYNTAX = """
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
HAVING count(*) >= 2
"""


def q_sql_scripting_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_script_events")
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 5 DO
            SET total = total + (
              SELECT coalesce(
                CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                     AS BIGINT), 0)
              FROM _script_events
              WHERE event_type = 'purchase' AND user_id % 5 = i);
            SET i = i + 1;
          END WHILE;
          SELECT total AS total_cents, CAST(i AS INT) AS n_buckets;
        END
        """
    )


SQL_SQL_SCRIPTING_ROLLUP = """
SELECT CAST(coalesce(
           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) AS BIGINT)
           AS total_cents,
       5 AS n_buckets
FROM events WHERE event_type = 'purchase'
"""


def q_sql_param_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's parameterized-SQL API surfaces in one dataflow: table
    names injected with the IDENTIFIER(:name) clause, a literal filter
    bound as a named parameter (spark.sql(..., args={...}) — no string
    splicing), and a data-derived cutoff computed by EXECUTE IMMEDIATE
    ... INTO a declared session variable. Money is exact integer cents
    (DECIMAL(12,2) cast then *100 — the double has true width 2dp, so
    neither engine rounds; NOTES.md pitfalls), and the cutoff is
    max-cents DIV 2 so the variable's value is engine-reproducible.
    The oracle is the classic literal form of the same query."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_param_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_param_cust")
    spark.sql("DECLARE OR REPLACE VARIABLE _param_cutoff_cents BIGINT DEFAULT 0")
    spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
        " DIV 2 FROM _param_orders' INTO _param_cutoff_cents"
    )
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS sum_price_cents
        FROM IDENTIFIER(:ord) o JOIN IDENTIFIER(:cust) c
          ON o.o_custkey = c.c_custkey
        WHERE CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  >= _param_cutoff_cents
          AND c.c_mktsegment <> :excl
        GROUP BY c.c_mktsegment
        """,
        args={"ord": "_param_orders", "cust": "_param_cust", "excl": "MACHINERY"},
    )


SQL_SQL_PARAM_EXEC = """
WITH cut AS (
    SELECT max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 2
               AS cents
    FROM orders
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey, cut
WHERE CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) >= cut.cents
  AND c.c_mktsegment <> 'MACHINERY'
GROUP BY c.c_mktsegment
"""


def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's GROUP BY ALL / ORDER BY ALL sugar: every non-aggregate
    select item becomes a grouping key. The oracle spells the expansion
    out (explicit GROUP BY 1, 2), binding that ALL resolves to exactly
    the non-aggregate columns. Money in exact integer cents."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS y,
               o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS sum_price_cents
        FROM _gba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


SQL_SQL_GROUP_BY_ALL = """
SELECT year(o_orderdate) AS y,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_price_cents
FROM orders
GROUP BY 1, 2
"""


QUERIES = {
    "sql_pipe_syntax": (q_sql_pipe_syntax, SQL_SQL_PIPE_SYNTAX),
    "sql_scripting_rollup": (q_sql_scripting_rollup, SQL_SQL_SCRIPTING_ROLLUP),
    "sql_param_exec": (q_sql_param_exec, SQL_SQL_PARAM_EXEC),
    "sql_group_by_all": (q_sql_group_by_all, SQL_SQL_GROUP_BY_ALL),
}
