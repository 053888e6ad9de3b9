"""Skyline (Pareto-frontier) operator — SKYLINE OF in the literature
(Börzsönyi et al., ICDE 2001): the maximal points under coordinate-wise
dominance. The multi-criteria "best offers" query relational engines
famously lack; here over orders maximizing (total price, recency).

Dominance: a dominates b iff a.cents >= b.cents AND a.day >= b.day AND
(a.cents, a.day) != (b.cents, b.day). Exact duplicates don't dominate
each other (both survive).

The 2-D skyline needs NO pairwise comparison: group rows by cents
(dense_rank), take each group's max day, then a prefix-max window over
the cents-descending group order gives "best day among strictly richer
orders" — a row survives iff that prefix max doesn't reach its day AND
no same-cents row has a strictly later day. One sort, two windows,
row-local verdicts. The ORACLE is the literal NOT EXISTS dominance
definition, so the window rewrite is held to the textbook semantics
(the dedup_sorted_neighborhood literal-definition pattern).

Scale: the plan is one global sort on cents (range exchange) + windows
— no self-join, no quadratic blow-up; the d>2 generalization keeps the
sort on the first dimension and verifies survivors against the (small)
running frontier, the standard block-nested-loop-with-sort hybrid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.ordered_stats import attach_order_stats
from movie_data_transformer_spark.sources.tables import load_table


def q_orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
        "CAST(o_orderdate AS DATE) AS day",
    )
    # "best day among strictly richer orders" now comes from an EXCLUSIVE
    # two-pass running max over the per-cents group table (ordered_stats)
    # joined back on cents — the old dense_rank + RANGE window pair
    # funneled every ORDER ROW through Exchange SinglePartition twice; on
    # the one-row-per-cents table, ROWS 1 PRECEDING is exactly "previous
    # distinct cents", so the semantics are unchanged (NULL on the
    # richest group, ties share a group)
    percents = orders.groupBy("cents").agg(F.max("day").alias("gmax"))
    rich = attach_order_stats(
        percents,
        [F.col("cents").desc()],
        "cents",
        True,
        running_max_excl={"richer_max_day": "gmax"},
    ).select("cents", "richer_max_day")
    walled = orders.selectExpr(
        "o_orderkey",
        "cents",
        "day",
        "max(day) OVER (PARTITION BY cents) AS same_cents_max_day",
    ).join(rich, "cents")
    return walled.filter(
        "(richer_max_day IS NULL OR richer_max_day < day)"
        " AND same_cents_max_day <= day"
    ).select("o_orderkey", "cents", "day")


SQL_ORDERS_SKYLINE = """
-- literal NOT EXISTS dominance, with the dominator set reduced to the
-- per-day maxima (lossless: if ANY b dominates a, the max-cents point r
-- of b.day has r.cents >= b.cents >= a.cents and r.day = b.day >= a.day,
-- and r != a coordinate-wise whenever b != a; a same-coordinate r is
-- exactly the duplicate case the definition excludes). Cuts the oracle
-- from |o|^2 to |o| x |days| without touching the semantics.
WITH o AS (
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(o_orderdate AS DATE) AS day
    FROM orders
),
reduced AS (
    SELECT day, max(cents) AS cents FROM o GROUP BY day
)
SELECT a.o_orderkey, a.cents, a.day
FROM o a
WHERE NOT EXISTS (
    SELECT 1 FROM reduced b
    WHERE b.cents >= a.cents AND b.day >= a.day
      AND (b.cents != a.cents OR b.day != a.day)
)
"""


QUERIES = {
    "orders_skyline": (q_orders_skyline, SQL_ORDERS_SKYLINE),
}
