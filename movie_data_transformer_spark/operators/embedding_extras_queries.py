"""Matryoshka-style dimension-truncated retrieval (Kusupati et al.
2022): score with a PREFIX of the embedding first, cheap, and compare
against the full-dimension ranking — the standard two-stage trick for
cutting ANN cost at 100 TB (score 8 of 64 dims in the first pass, keep
a shortlist, re-rank with all dims).

Scores are exact integer micro-unit dot products (floor(v * 1e6) per
coordinate — float->double is exact and floor of identical doubles is
bit-identical cross-engine, the ann_ivf_incremental_assign recipe), so
both rankings and the per-rank agreement flag get a FULL oracle.

Scale: the query side (5 vectors) broadcasts; the corpus side is one
map-side scan per scorer fused into shared ranking windows on qid —
the brute-force layout sim_brute_topk already audits, here doubled to
bind the truncation/full agreement itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

N_QUERIES = 5
PREFIX_DIMS = 8
TOP_K = 3

_QDOT = (
    "aggregate(zip_with({q}, {c}, (a, b) ->"
    " CAST(floor(CAST(a AS DOUBLE) * 1000000) AS BIGINT)"
    " * CAST(floor(CAST(b AS DOUBLE) * 1000000) AS BIGINT)),"
    " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)


def q_emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS qid", "embedding AS qe"
    )
    pairs = (
        emb.selectExpr("vec_id AS cid", "embedding AS ce")
        .crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .selectExpr(
            "qid",
            "cid",
            f"{_QDOT.format(q='qe', c='ce')} AS full_dot",
            f"{_QDOT.format(q=f'slice(qe, 1, {PREFIX_DIMS})', c=f'slice(ce, 1, {PREFIX_DIMS})')}"
            " AS prefix_dot",
        )
    )
    w_full = Window.partitionBy("qid").orderBy(
        F.col("full_dot").desc(), F.col("cid").asc()
    )
    w_pre = Window.partitionBy("qid").orderBy(
        F.col("prefix_dot").desc(), F.col("cid").asc()
    )
    ranked = pairs.select(
        "qid",
        "cid",
        F.row_number().over(w_full).alias("rank_full"),
        F.row_number().over(w_pre).alias("rank_pre"),
    )
    full = ranked.filter(F.col("rank_full") <= TOP_K).selectExpr(
        "qid", "rank_full AS rank", "cid AS full_pick"
    )
    pre = ranked.filter(F.col("rank_pre") <= TOP_K).selectExpr(
        "qid", "rank_pre AS rank", "cid AS prefix_pick"
    )
    return (
        full.join(pre, ["qid", "rank"])
        .selectExpr(
            "qid",
            "CAST(rank AS BIGINT) AS rank",
            "full_pick",
            "prefix_pick",
            "CAST(full_pick = prefix_pick AS INT) AS picks_agree",
        )
    )


SQL_EMB_MATRYOSHKA_TOPK = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS qe FROM embeddings
    WHERE vec_id < {N_QUERIES}
),
d AS (
    SELECT c.vec_id AS cid, q.qid, q.qe, c.embedding AS ce,
           unnest(range(1, len(c.embedding) + 1)) AS i
    FROM embeddings c, q
    WHERE c.vec_id <> q.qid
),
dots AS (
    SELECT qid, cid,
           CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(floor(CAST(ce[i] AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS full_dot,
           CAST(sum(CASE WHEN i <= {PREFIX_DIMS} THEN
                    CAST(floor(CAST(qe[i] AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(floor(CAST(ce[i] AS DOUBLE) * 1000000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS prefix_dot
    FROM d GROUP BY qid, cid
),
ranked AS (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY full_dot DESC, cid ASC) AS rank_full,
           row_number() OVER (PARTITION BY qid
                              ORDER BY prefix_dot DESC, cid ASC) AS rank_pre
    FROM dots
)
SELECT f.qid,
       CAST(f.rank_full AS BIGINT) AS rank,
       f.cid AS full_pick,
       p.cid AS prefix_pick,
       CAST(f.cid = p.cid AS INT) AS picks_agree
FROM (SELECT * FROM ranked WHERE rank_full <= {TOP_K}) f
JOIN (SELECT * FROM ranked WHERE rank_pre <= {TOP_K}) p
  ON f.qid = p.qid AND f.rank_full = p.rank_pre
"""


QUERIES = {
    "emb_matryoshka_topk": (q_emb_matryoshka_topk, SQL_EMB_MATRYOSHKA_TOPK),
}
