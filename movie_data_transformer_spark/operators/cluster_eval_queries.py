"""Clustering-quality evaluation: simplified (centroid-based) silhouette
over the frozen IVF cells — the audit a vector-store operator runs after
(re)training coarse centroids to decide whether the partitioning is
worth keeping. Completes the IVF lifecycle the repo already has: train
(kmeans_assign, rows-only) -> freeze (frozen_centroids_micro, exact) ->
incremental assign (ann_ivf_incremental_assign, full oracle) ->
EVALUATE (this module, full oracle).

`kmeans_silhouette_fixed`: with the frozen micro-unit centroids derived
from the embeddings' label column (same exact derivation as the
incremental-assign oracle), every vector's
  a = squared-L2 distance to its NEAREST centroid (its own cell),
  b = distance to the second-nearest,
  s_micro = (b - a) * 1e6 div max(a, b)   (0 when max is 0)
— the centroid-silhouette of Kaufman & Rousseeuw's simplified variant
(distances to centroids instead of all points: O(n*k), not O(n^2) — the
ONLY silhouette that exists at 100 TB). Output per cell: n_points,
avg_s_micro (= sum(s) div n), min_s_micro. All exact integers, FULL
DuckDB oracle.

Scale: the k-row centroid table broadcasts; per-vector scoring is
map-side (k distances per row, argmin/arg2nd via sorted 2-element
fold); the only shuffle is the final per-cell agg. No pairwise
distances anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.similarity import frozen_centroids_micro
from movie_data_transformer_spark.sources.tables import load_table


def centroid_silhouette(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(cell, n_points, avg_s_micro, min_s_micro) — simplified silhouette
    against an already-frozen (label, centroid_micro) table."""
    v = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)"
        " AS BIGINT)) AS vm",
    )
    # nearest (own cell, a) and second-nearest (b) per vector, computed
    # ROW-LOCALLY against the k-row centroid table collapsed into ONE
    # broadcast array row: per vector, transform the centroid array into
    # (dist, label) structs, array_sort, take the first two. The old form
    # broadcast-joined every vector with every centroid (n x k rows) and
    # re-grouped on vec_id to collect the score list — a k-fold
    # vector-grain shuffle for a decision that only needs the tiny
    # centroid table (r12 opt round; same 1-row scalar-broadcast pattern
    # as the TPC-H q11/q15 thresholds). Sort order (dist, label) and the
    # label tiebreak are unchanged.
    cent_row = cents.agg(
        F.collect_list(F.struct("label", "centroid_micro")).alias("_cents")
    )
    # degenerate-input guard (r12 ADVICE low #4): with EMPTY cents the
    # 1-row collect_list aggregate still emits one empty-array row, and
    # without the filter every vector would surface as a NULL-cell group
    # where the old broadcast-join form returned zero rows
    two = v.crossJoin(F.broadcast(cent_row)).filter("size(_cents) > 0").selectExpr(
        "vec_id",
        "slice(array_sort(transform(_cents, c -> named_struct("
        " 'dist', aggregate(zip_with(vm, c.centroid_micro,"
        " (x, cc) -> (x - cc) * (x - cc)), 0L, (acc, d) -> acc + d),"
        " 'label', c.label))), 1, 2) AS _top2",
    )
    sil = two.selectExpr(
        "vec_id",
        "CAST(_top2[0].label AS INT) AS cell",
        "_top2[0].dist AS a_dist",
        "_top2[1].dist AS b_dist",
    ).selectExpr(
        "cell",
        "CASE WHEN greatest(a_dist, b_dist) = 0 THEN CAST(0 AS BIGINT) "
        "ELSE (b_dist - a_dist) * 1000000 div greatest(a_dist, b_dist) END"
        " AS s_micro",
    )
    return sil.groupBy("cell").agg(
        F.count("*").alias("n_points"),
        F.expr("sum(s_micro) div count(*)").cast("long").alias("avg_s_micro"),
        F.min("s_micro").alias("min_s_micro"),
    )


def q_kmeans_silhouette_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_silhouette(emb, frozen_centroids_micro(emb))


SQL_KMEANS_SILHOUETTE_FIXED = """
WITH sdims AS (
    SELECT label, dim,
           CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000) AS BIGINT)
               AS vm
    FROM (SELECT label, embedding,
                 unnest(range(0, len(embedding))) AS dim
          FROM embeddings)
),
cmeans AS (
    SELECT label, dim,
           CAST(CAST(sum(vm) AS BIGINT) // count(*) AS BIGINT) AS cm
    FROM sdims GROUP BY 1, 2
),
vdims AS (
    SELECT vec_id, dim,
           CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000) AS BIGINT)
               AS vm
    FROM (SELECT vec_id, embedding,
                 unnest(range(0, len(embedding))) AS dim
          FROM embeddings)
),
scored AS (
    SELECT v.vec_id, c.label,
           CAST(sum((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS dist
    FROM vdims v JOIN cmeans c USING (dim)
    GROUP BY 1, 2
),
two AS (
    SELECT vec_id,
           min(CASE WHEN rn = 1 THEN label END) AS own_label,
           min(CASE WHEN rn = 1 THEN dist END) AS a_dist,
           min(CASE WHEN rn = 2 THEN dist END) AS b_dist
    FROM (SELECT vec_id, label, dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist ASC, label ASC) AS rn
          FROM scored)
    WHERE rn <= 2
    GROUP BY vec_id
),
sil AS (
    SELECT CAST(own_label AS INT) AS cell,
           CASE WHEN greatest(a_dist, b_dist) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((b_dist - a_dist) * 1000000
                          // greatest(a_dist, b_dist) AS BIGINT) END AS s_micro
    FROM two
)
SELECT cell,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(CAST(sum(s_micro) AS BIGINT) // count(*) AS BIGINT) AS avg_s_micro,
       CAST(min(s_micro) AS BIGINT) AS min_s_micro
FROM sil
GROUP BY cell
"""


def q_emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the exact squared-L2
    micro-distance between the centroid of the FIRST half of the corpus
    and the SECOND half (vec_id parity — the deterministic stand-in for
    yesterday/today), plus both halves' sizes. The alarm a production
    embedding pipeline keeps on its encoder: a re-deployed model or a
    shifted upstream corpus moves the per-cell centroids, and this is
    the cheapest exact statistic that sees it. Same truncating-division
    micro-centroid derivation as frozen_centroids_micro, so the whole
    monitor carries a FULL oracle.

    Scale: two grain-sized centroid aggs (shuffle on (label, dim)) + a
    k-row join; the drift compare never touches vector pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    halves = []
    for p in (0, 1):
        halves.append(
            frozen_centroids_micro(emb.filter(f"vec_id % 2 = {p}")).selectExpr(
                "label", f"centroid_micro AS c{p}"
            )
        )
    counts = emb.selectExpr("label", "vec_id % 2 AS p").groupBy("label").agg(
        F.expr("CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_first"
        ),
        F.expr("CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_second"
        ),
    )
    return (
        halves[0]
        .join(halves[1], "label")
        .join(counts, "label")
        .selectExpr(
            "CAST(label AS INT) AS label",
            "n_first",
            "n_second",
            "aggregate(zip_with(c0, c1, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS drift_l2sq_micro",
        )
    )


SQL_EMB_CENTROID_DRIFT = """
WITH dims AS (
    SELECT label, vec_id % 2 AS p, dim,
           CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000) AS BIGINT)
               AS vm
    FROM (SELECT label, vec_id, embedding,
                 unnest(range(0, len(embedding))) AS dim
          FROM embeddings)
),
cents AS (
    SELECT label, p, dim,
           CAST(CAST(sum(vm) AS BIGINT) // count(*) AS BIGINT) AS cm
    FROM dims GROUP BY 1, 2, 3
),
drift AS (
    SELECT a.label,
           CAST(sum((a.cm - b.cm) * (a.cm - b.cm)) AS BIGINT)
               AS drift_l2sq_micro
    FROM cents a JOIN cents b
      ON a.label = b.label AND a.dim = b.dim AND a.p = 0 AND b.p = 1
    GROUP BY a.label
),
counts AS (
    SELECT label,
           CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first,
           CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_second
    FROM embeddings GROUP BY label
)
SELECT CAST(label AS INT) AS label, n_first, n_second, drift_l2sq_micro
FROM drift JOIN counts USING (label)
"""


QUERIES = {
    "kmeans_silhouette_fixed": (
        q_kmeans_silhouette_fixed,
        SQL_KMEANS_SILHOUETTE_FIXED,
    ),
    "emb_centroid_drift": (q_emb_centroid_drift, SQL_EMB_CENTROID_DRIFT),
}
