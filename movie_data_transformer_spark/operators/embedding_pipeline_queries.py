"""Round-6 embedding pipeline composition: store-compressed, search —
the production retrieval path where the corpus lives as int8 codes
(4x smaller, emb_int8_quantize) and queries run against RECONSTRUCTED
vectors. Binds compression -> reconstruction -> scoring -> ranking as
one dataflow: a wrong quantize scale, reconstruction convention, or
tie-break shows up as a ranking diff the driver hash catches.

All integer: micro quantize (floor(v * 1e6)), affine codes
(x - vmin) * 255 DIV range, reconstruction vmin + k * range DIV 255,
bigint dot products (|recon| <= ~2^21, 64-dim dots < 2^48 — exact even
through DuckDB's double list_inner_product, since integers below 2^53
are exact in IEEE and each partial stays integral). FULL oracle.

Scale: the query side is broadcast (50 rows at sf0.1-like corpora; a
real deployment batches queries); corpus scoring is map-side; one
ranking exchange for the per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

K = 5

_VM = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"


def _reconstructed(emb: DataFrame) -> DataFrame:
    return (
        emb.selectExpr("vec_id", f"{_VM} AS vm")
        .selectExpr(
            "vec_id",
            "array_min(vm) AS vmin",
            "array_max(vm) - array_min(vm) AS rng",
            "vm",
        )
        .selectExpr(
            "vec_id",
            "transform(vm, x -> CASE WHEN rng = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (x - vmin) * 255 DIV rng END) AS codes",
            "vmin",
            "rng",
        )
        .selectExpr(
            "vec_id",
            "transform(codes, k -> vmin + k * rng DIV 255) AS recon",
        )
    )


def q_emb_int8_retrieval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    recon = _reconstructed(emb)
    q = recon.filter(F.col("vec_id") % 50 == 0).selectExpr(
        "vec_id AS query_id", "recon AS qr"
    )
    c = recon.selectExpr("vec_id AS neighbor_id", "recon AS cr")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .selectExpr(
            "query_id",
            "neighbor_id",
            "aggregate(zip_with(qr, cr, (a, b) -> a * b), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x) AS dot_micro2",
        )
    )
    return scored.selectExpr(
        "query_id",
        "neighbor_id",
        "dot_micro2",
        "CAST(row_number() OVER (PARTITION BY query_id"
        " ORDER BY dot_micro2 DESC, neighbor_id ASC) AS INT) AS rk",
    ).filter(F.col("rk") <= K)


SQL_EMB_INT8_RETRIEVAL_E2E = f"""
WITH vm AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
    FROM embeddings
),
anch AS (
    SELECT vec_id, list_min(v) AS vmin, list_max(v) - list_min(v) AS rng, v
    FROM vm
),
recon AS (
    SELECT vec_id,
           list_transform(v, x -> vmin +
               (CASE WHEN rng = 0 THEN 0 ELSE (x - vmin) * 255 // rng END)
               * rng // 255) AS r
    FROM anch
)
SELECT query_id, neighbor_id, dot_micro2, CAST(rk AS INT) AS rk FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_inner_product(CAST(q.r AS DOUBLE[]),
                                   CAST(c.r AS DOUBLE[])) AS BIGINT)
               AS dot_micro2,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY CAST(list_inner_product(CAST(q.r AS DOUBLE[]),
                             CAST(c.r AS DOUBLE[])) AS BIGINT) DESC,
                        c.vec_id ASC) AS rk
    FROM recon q JOIN recon c ON q.vec_id <> c.vec_id
    WHERE q.vec_id % 50 = 0
) t WHERE rk <= {K}
"""


QUERIES = {
    "emb_int8_retrieval_e2e": (q_emb_int8_retrieval_e2e, SQL_EMB_INT8_RETRIEVAL_E2E),
}
