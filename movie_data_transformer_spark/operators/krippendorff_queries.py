"""Krippendorff's alpha (nominal data) over the same three deterministic
quality gates used by stats_fleiss_kappa / stats_mcnemar_exact — the
third of the standard inter-rater statistics (Krippendorff 1970/2004),
preferred over Fleiss kappa when raters/items can be missing; here all
m = 3 raters rate every document, which makes the nominal form exact
bigint arithmetic.

For binary categories with k_i keep-votes on item i of n items, m raters:
    Do_num = sum_i k_i * (m - k_i)         (disagreeing pairs per item /2)
    C1     = sum_i k_i,  C0 = n*m - C1
    alpha  = 1 - Do_num * (n*m - 1) / ((m - 1) * C1 * C0)
(the common 2s cancel; the (n*m-1)/(m-1) collapse keeps every product
below ~7 * n^2 * 1e6, i.e. bigint-safe to ~1e6 documents — the same
headroom note as stats_fleiss_kappa; beyond that recompute in decimal.)

Edge case: if C1 = 0 or C0 = 0 every rating is identical — expected
disagreement is zero and alpha is undefined; we report 1_000_000
(perfect agreement) with the convention documented here and pinned in
tests/test_rater_eval_extras.py.

Entry `stats_krippendorff_alpha` (FULL DuckDB oracle): one row —
n_docs, m_raters, do_num, c1, c0, alpha_micro.

Scale: identical to the sibling rater stats — one documents scan, fused
gate projection, single 1-row aggregate; scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.rater_eval_queries import (
    M_RATERS,
    _FLAGS_CTE,
    _flags,
)

M = M_RATERS


def q_stats_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    votes = _flags(spark, sf_dir).selectExpr(
        "CAST(r1 AS INT) + CAST(r2 AS INT) + CAST(r3 AS INT) AS k"
    )
    agg = votes.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"k * ({M} - k)")).cast("bigint").alias("do_num"),
        F.sum("k").cast("bigint").alias("c1"),
    )
    return agg.selectExpr(
        "n_docs",
        f"CAST({M} AS BIGINT) AS m_raters",
        "do_num",
        "c1",
        f"n_docs * {M} - c1 AS c0",
        f"CASE WHEN c1 = 0 OR n_docs * {M} - c1 = 0 THEN 1000000L ELSE"
        f" 1000000 - CAST(do_num * (n_docs * {M} - 1) * 1000000"
        f" DIV (({M} - 1) * c1 * (n_docs * {M} - c1)) AS BIGINT)"
        " END AS alpha_micro",
    )


SQL_STATS_KRIPPENDORFF_ALPHA = f"""
WITH {_FLAGS_CTE},
votes AS (
    SELECT CAST(r1 AS INT) + CAST(r2 AS INT) + CAST(r3 AS INT) AS k FROM flags
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k * ({M} - k)) AS BIGINT) AS do_num,
           CAST(sum(k) AS BIGINT) AS c1
    FROM votes
)
SELECT n_docs,
       CAST({M} AS BIGINT) AS m_raters,
       do_num,
       c1,
       n_docs * {M} - c1 AS c0,
       CASE WHEN c1 = 0 OR n_docs * {M} - c1 = 0 THEN CAST(1000000 AS BIGINT)
            ELSE 1000000 - CAST(do_num * (n_docs * {M} - 1) * 1000000
                 // (({M} - 1) * c1 * (n_docs * {M} - c1)) AS BIGINT)
       END AS alpha_micro
FROM agg
"""


QUERIES = {
    "stats_krippendorff_alpha": (
        q_stats_krippendorff_alpha,
        SQL_STATS_KRIPPENDORFF_ALPHA,
    ),
}
