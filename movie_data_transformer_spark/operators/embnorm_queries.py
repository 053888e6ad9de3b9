"""Embedding-norm health report — the first thing an embedding pipeline
checks after a model change: are norms stable per class, did anything
collapse to ~0, did a class drift hot? Companions: emb_int8_quantize
(compression), emb_centroid_drift (movement), kmeans_silhouette_fixed
(separation).

Exactness: each float coordinate is micro-quantized ONCE
(floor(x * 1e6) on the identical float -> double promotion in both
engines — exact, floats are exactly representable in double), and every
norm after that is exact bigint: normsq_microsq = sum_d q_d^2, with
64 dims * (1e6-scale)^2 ~ 6e13 per vector — bigint-safe headroom of
~1e5 vectors per SUM group documented below. Group means use truncating
DIV.

Entry `emb_norm_stats` (FULL DuckDB oracle): per label — n_vecs,
mean_normsq (microsq DIV n), min_normsq, max_normsq, plus
n_near_zero (normsq below (0.1e6)^2, i.e. vectors with L2 < 0.1 —
the collapse detector).

Headroom note: sum of normsq over a group overflows int64 at ~1.5e5
vectors/group at this scale (6e13 each); for larger groups compute the
sum in DECIMAL(38,0) (both engines support it exactly) — the
stats_fleiss_kappa discipline.

Scale: map-side array fold per row (aggregate() in whole-stage
codegen), one label-keyed agg — scan-bound; vectors never join or
shuffle beyond the k-row group agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

NEAR_ZERO_SQ = 10_000_000_000  # (0.1 * 1e6)^2: L2 < 0.1 counts as collapsed

_NORMSQ_SPARK = (
    "aggregate(embedding, 0L, (acc, x) ->"
    " acc + CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
    " * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)
_NORMSQ_DUCK = (
    "list_sum(list_transform(embedding, x ->"
    " CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
    " * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))"
)


def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_vec = emb.selectExpr(
        "label", f"CAST({_NORMSQ_SPARK} AS BIGINT) AS normsq"
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("normsq").cast("bigint").alias("_sum"),
            F.min("normsq").cast("bigint").alias("min_normsq"),
            F.max("normsq").cast("bigint").alias("max_normsq"),
            F.sum(F.expr("IF(normsq < 10000000000, 1, 0)"))
            .cast("bigint")
            .alias("n_near_zero"),
        )
        .selectExpr(
            "CAST(label AS BIGINT) AS label",
            "n_vecs",
            "CAST(_sum DIV n_vecs AS BIGINT) AS mean_normsq",
            "min_normsq",
            "max_normsq",
            "n_near_zero",
        )
    )


SQL_EMB_NORM_STATS = f"""
WITH per_vec AS (
    SELECT label, CAST({_NORMSQ_DUCK} AS BIGINT) AS normsq
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(normsq) // count(*) AS BIGINT) AS mean_normsq,
       CAST(min(normsq) AS BIGINT) AS min_normsq,
       CAST(max(normsq) AS BIGINT) AS max_normsq,
       CAST(count(*) FILTER (normsq < 10000000000) AS BIGINT) AS n_near_zero
FROM per_vec
GROUP BY label
"""


QUERIES = {
    "emb_norm_stats": (q_emb_norm_stats, SQL_EMB_NORM_STATS),
}
