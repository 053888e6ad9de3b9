"""Kendall concordance per ship-year — the third rank-association
estimator next to Pearson (stats_corr_by_year) and Spearman
(stats_spearman_by_year). Exact concordant/discordant/tied-pair counts
of (daily avg quantity, daily avg price), and tau-a in micro units —
all integer arithmetic, no sqrt (tau-b's tie correction needs one, so
the tie counts are emitted raw instead and tau-b is one float away for
the caller).

Pairwise on the DAY GRAIN, the stats_theil_sen_by_year discipline: the
per-year pair space is bounded by 366^2/2 FOREVER, which is what makes
the O(n^2) estimator scale-correct — the day pre-aggregation absorbs
the data growth, the pair join runs on <=366 rows per year no matter
how many fact rows feed it. (The O(n log n) merge-sort inversion count
is inherently sequential per group; the day-grain quadratic form is the
distributed answer.) FULL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_stats_kendall_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.selectExpr(
        "year(l_shipdate) AS y",
        "CAST(l_shipdate AS DATE) AS day",
        "CAST(floor(l_quantity * 100) AS BIGINT) AS q",
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS p",
    ).groupBy("y", "day").agg(
        F.expr("sum(q) div count(*)").alias("qa"),
        F.expr("sum(p) div count(*)").alias("pa"),
    )
    a = daily.selectExpr("y", "day AS day_a", "qa AS qa_a", "pa AS pa_a")
    b = daily.selectExpr("y", "day AS day_b", "qa AS qa_b", "pa AS pa_b")
    pairs = a.join(b, "y").filter("day_a < day_b").selectExpr(
        "y",
        "CASE WHEN (qa_a < qa_b AND pa_a < pa_b)"
        " OR (qa_a > qa_b AND pa_a > pa_b) THEN 1 ELSE 0 END AS c",
        "CASE WHEN (qa_a < qa_b AND pa_a > pa_b)"
        " OR (qa_a > qa_b AND pa_a < pa_b) THEN 1 ELSE 0 END AS d",
    )
    return pairs.groupBy("y").agg(
        F.sum("c").cast("long").alias("concordant"),
        F.sum("d").cast("long").alias("discordant"),
        F.expr("CAST(count(*) - sum(c) - sum(d) AS BIGINT)").alias("tied"),
        F.expr(
            "CAST((sum(c) - sum(d)) * 1000000 div count(*) AS BIGINT)"
        ).alias("tau_a_micro"),
    )


SQL_STATS_KENDALL_BY_YEAR = """
WITH daily AS (
    SELECT year(CAST(l_shipdate AS DATE)) AS y,
           CAST(l_shipdate AS DATE) AS day,
           CAST(CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                // count(*) AS BIGINT) AS qa,
           CAST(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                // count(*) AS BIGINT) AS pa
    FROM lineitem
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.y,
           CASE WHEN (a.qa < b.qa AND a.pa < b.pa)
                  OR (a.qa > b.qa AND a.pa > b.pa) THEN 1 ELSE 0 END AS c,
           CASE WHEN (a.qa < b.qa AND a.pa > b.pa)
                  OR (a.qa > b.qa AND a.pa < b.pa) THEN 1 ELSE 0 END AS d
    FROM daily a JOIN daily b ON a.y = b.y AND a.day < b.day
)
SELECT y,
       CAST(sum(c) AS BIGINT) AS concordant,
       CAST(sum(d) AS BIGINT) AS discordant,
       CAST(count(*) - sum(c) - sum(d) AS BIGINT) AS tied,
       CAST((sum(c) - sum(d)) * 1000000 // count(*) AS BIGINT) AS tau_a_micro
FROM pairs
GROUP BY y
"""


QUERIES = {
    "stats_kendall_by_year": (q_stats_kendall_by_year, SQL_STATS_KENDALL_BY_YEAR),
}
