"""Hill tail-index estimation (Hill 1975) — the standard heavy-tail
diagnostic: for each event stream, how Pareto-like is the upper tail of
`value`? alpha ~ 1 means extreme events dominate totals (plan capacity
for whales); alpha > 2 means variance is finite and mean-based
monitoring is sound. Complements the distribution-shape family
(orders_pareto_share, orders_gini_spend, stats_ks_two_sample,
events_value_mad_outliers) with the tail-EXPONENT itself.

    hill_k = (1/k) * sum_{i=1..k} ln( x_(i) / x_(k+1) )      (x_(1) max)
    alpha  = 1 / hill_k

Exactness discipline: values go to exact integer cents first; each of
the k log terms is ONE ln call on an identical integer ratio, floored
to micro per RANK before the integer mean (order-independent — the
dsir_queries libm note); alpha_micro = 1e12 DIV hill_micro (exact
integer reciprocal of the micro value).

Entry `stats_hill_tail_index` (FULL DuckDB oracle): per event_type —
n, k, xk1_cents (the k+1-th order statistic), hill_micro, alpha_micro.
k = 50 (fixture-safe at every SF; at sf0.001 each type still has ~200
events — a row floor is pinned in pytest).

Scale: one rank window per event_type (WindowGroupLimit prunes to the
top k+1 rows map-side — only k+1 rows per type survive the shuffle),
then a k-row-per-type aggregate. The tail is BY DEFINITION tiny;
everything after the scan is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_transformer_spark.sources.tables import load_table

K = 50

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def q_stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "event_id", f"{_CENTS} AS cents"
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    top = ev.withColumn("rn", F.row_number().over(w)).filter(f"rn <= {K + 1}")
    xk1 = top.filter(f"rn = {K + 1}").selectExpr(
        "event_type", "cents AS xk1_cents"
    )
    n_per = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    terms = (
        top.filter(f"rn <= {K}")
        .join(xk1, "event_type")
        .selectExpr(
            "event_type",
            "xk1_cents",
            "CAST(floor(ln(CAST(cents AS DOUBLE) / xk1_cents) * 1000000)"
            " AS BIGINT) AS term_micro",
        )
    )
    hill = terms.groupBy("event_type", "xk1_cents").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("term_micro").cast("bigint").alias("_sum"),
    )
    return (
        hill.join(F.broadcast(n_per), "event_type")
        .selectExpr(
            "event_type",
            "n",
            "k",
            "xk1_cents",
            "CAST(_sum DIV k AS BIGINT) AS hill_micro",
            "CASE WHEN _sum DIV k = 0 THEN NULL ELSE"
            " CAST(1000000000000 DIV (_sum DIV k) AS BIGINT)"
            " END AS alpha_micro",
        )
    )


SQL_STATS_HILL_TAIL_INDEX = f"""
WITH ev AS (
    SELECT event_type, event_id, {_CENTS} AS cents FROM events
),
ranked AS (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cents DESC, event_id) AS rn
    FROM ev
),
xk1 AS (
    SELECT event_type, cents AS xk1_cents FROM ranked WHERE rn = {K + 1}
),
n_per AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1
),
terms AS (
    SELECT r.event_type, x.xk1_cents,
           CAST(floor(ln(CAST(r.cents AS DOUBLE) / x.xk1_cents) * 1000000)
               AS BIGINT) AS term_micro
    FROM ranked r JOIN xk1 x ON x.event_type = r.event_type
    WHERE r.rn <= {K}
),
hill AS (
    SELECT event_type, xk1_cents,
           CAST(count(*) AS BIGINT) AS k,
           CAST(sum(term_micro) AS BIGINT) AS s
    FROM terms GROUP BY 1, 2
)
SELECT h.event_type, n.n, h.k, h.xk1_cents,
       CAST(h.s // h.k AS BIGINT) AS hill_micro,
       CASE WHEN h.s // h.k = 0 THEN NULL ELSE
            CAST(1000000000000 // (h.s // h.k) AS BIGINT)
       END AS alpha_micro
FROM hill h JOIN n_per n ON n.event_type = h.event_type
"""


QUERIES = {
    "stats_hill_tail_index": (
        q_stats_hill_tail_index,
        SQL_STATS_HILL_TAIL_INDEX,
    ),
}
