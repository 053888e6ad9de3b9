"""Cross-source score calibration by quantile normalization — the step a
multi-source training corpus needs before a single quality threshold can
be applied: each source's classifier-score distribution is mapped onto
the GLOBAL distribution by relative rank, so "top 30% of source X" and
"top 30% of source Y" land on the same calibrated scale even when one
source's raw scores run systematically hot.

Math (all exact integers): within each source, rank r_s of a doc by
(score, doc_id) — a TOTAL order, so both engines agree; the calibrated
value is the global score at rank floor((r_s - 1) * N / n_s) + 1, i.e.
the global order statistic at the same relative position. FULL oracle.

Scale: the per-source window shuffles once on source; the GLOBAL ranking
is a single-reducer sort in this exact form — fine to ~1e8 rows, and at
100 TB the global table is replaced by a mergeable quantile sketch
(agg_kll_quantiles) mapping relative rank -> approximate order statistic
with the same downstream join, exactly like ccnet_lm_buckets' documented
tercile-cutoff swap. The rank join keys are integers, bucketable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

_SCORE_EXPR = (
    r"aggregate(split(trim(text), '\\s+'), 0L, (acc, x) -> acc +"
    " ((CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT) % 2001) - 1000))"
)


def q_score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.selectExpr("doc_id", "source", f"{_SCORE_EXPR} AS score")
    ranked = scored.selectExpr(
        "doc_id",
        "source",
        "score",
        "row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS r_s",
        "count(*) OVER (PARTITION BY source) AS n_s",
        "count(*) OVER () AS n_total",
    ).selectExpr(
        "doc_id",
        "source",
        "score",
        "CAST((r_s - 1) * n_total DIV n_s + 1 AS BIGINT) AS g_rank",
    )
    glob = scored.selectExpr(
        "score AS norm_score",
        "row_number() OVER (ORDER BY score, doc_id) AS g_rank",
    )
    return ranked.join(glob, "g_rank").select(
        "doc_id", "source", "score", "norm_score"
    )


SQL_SCORE_QUANTILE_NORMALIZE = r"""
WITH scored AS (
    SELECT doc_id, source,
           CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001) - 1000))
               AS BIGINT) AS score
    FROM documents
),
ranked AS (
    SELECT doc_id, source, score,
           CAST((row_number() OVER (PARTITION BY source ORDER BY score, doc_id)
                 - 1)
                * (count(*) OVER ())
                // (count(*) OVER (PARTITION BY source)) + 1 AS BIGINT) AS g_rank
    FROM scored
),
gtab AS (
    SELECT score AS norm_score,
           row_number() OVER (ORDER BY score, doc_id) AS g_rank
    FROM scored
)
SELECT r.doc_id, r.source, r.score, g.norm_score
FROM ranked r JOIN gtab g USING (g_rank)
"""


QUERIES = {
    "score_quantile_normalize": (
        q_score_quantile_normalize,
        SQL_SCORE_QUANTILE_NORMALIZE,
    ),
}
