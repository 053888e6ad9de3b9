"""DCT perceptual hash (classic pHash recipe) over the BMP tier — the
frequency-domain image fingerprint that survives resizing/brightness
edits which break the spatial dHash already shipped (mm_image_dhash):
nearest-resize to 8x8, integer luma, 8x8 DCT-II, hash = each of the 15
lowest-frequency AC coefficients compared against their median.

Exactness: the DCT basis is IRRATIONAL, so the cosine table is planted
ONCE as micro-unit integer literals (multimodal.COS8_MICRO — the
ranking_eval DISC_MICRO discipline) and the whole pipeline is exact
integer arithmetic: resize indexes are floor divisions (the
mm_resize_nearest rule sx = t*w DIV 8), coefficients are bigint sums of
luma * C[k][y] * C[l][x], and the median of the 15 AC coefficients is
(8th + 9th order statistic) DIV 2 (truncating identically in numpy-side
Python, Spark DIV, and DuckDB //). The Spark side decodes REAL BMP
bytes (multimodal.bmp_phash_dct); the oracle replays every step from
the planted pixel formula.

Entry `mm_bmp_phash_dct` (FULL DuckDB oracle): per doc — phash (15-bit
int, bit pos = row-major (k,l) order minus the DC slot), dc_coeff,
median_coeff.

Scale: one mapInPandas decode pass; per-image work is a fixed 8x8
matrix sandwich — decode-bound, media never shuffles. Downstream
near-dup mining buckets on the 15-bit hash exactly like
mm_image_dhash's banded pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.multimodal import (
    COS8_MICRO,
    bmp_phash_dct,
    synthesize_bmp_media,
)
from movie_data_transformer_spark.sources.tables import load_table


def q_mm_bmp_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bmp_phash_dct(synthesize_bmp_media(docs))


_COS_DUCK = (
    "["
    + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in COS8_MICRO)
    + "]"
)

SQL_MM_BMP_PHASH_DCT = f"""
WITH p AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 9 AS h
           FROM documents),
ty AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS t FROM p),
tygrid AS (SELECT doc_id, w, h, t AS yy, (t * h) // 8 AS sy FROM ty),
txgrid AS (SELECT doc_id, t AS xx, (t * w) // 8 AS sx
           FROM (SELECT doc_id, w, unnest(range(0, 8)) AS t FROM p)),
cellv AS (
    SELECT a.doc_id, a.yy, b.xx,
           2 * ((a.doc_id * 7 + b.sx * 13 + a.sy * 31) % 256)
           + 5 * ((a.doc_id * 11 + b.sx * 17 + a.sy * 5) % 256)
           + ((a.doc_id * 3 + b.sx * 29 + a.sy * 23) % 256) AS luma
    FROM tygrid a JOIN txgrid b ON b.doc_id = a.doc_id
),
kl AS (SELECT k, l FROM (SELECT unnest(range(0, 4)) AS k),
                        (SELECT unnest(range(0, 4)) AS l)),
coef AS (
    SELECT c.doc_id, g.k, g.l,
           CAST(sum(c.luma
                * ({_COS_DUCK})[g.k + 1][c.yy + 1]
                * ({_COS_DUCK})[g.l + 1][c.xx + 1]) AS BIGINT) AS d
    FROM cellv c CROSS JOIN kl g
    GROUP BY 1, 2, 3
),
ac AS (
    SELECT doc_id, k * 4 + l - 1 AS pos, d,
           row_number() OVER (PARTITION BY doc_id ORDER BY d, k, l) AS rn
    FROM coef WHERE NOT (k = 0 AND l = 0)
),
med AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN rn IN (8, 9) THEN d END) AS BIGINT) AS m2
    FROM ac GROUP BY doc_id
),
medv AS (
    SELECT doc_id,
           CASE WHEN m2 >= 0 THEN m2 // 2 ELSE -((-m2) // 2) END AS median
    FROM med
),
bits AS (
    SELECT a.doc_id,
           CAST(sum(CASE WHEN a.d > m.median
                    THEN CAST(1 AS BIGINT) << a.pos ELSE 0 END) AS BIGINT)
               AS phash,
           max(m.median) AS median_coeff
    FROM ac a JOIN medv m ON m.doc_id = a.doc_id
    GROUP BY a.doc_id
)
SELECT b.doc_id, b.phash,
       CAST(c.d AS BIGINT) AS dc_coeff,
       CAST(b.median_coeff AS BIGINT) AS median_coeff
FROM bits b JOIN coef c ON c.doc_id = b.doc_id AND c.k = 0 AND c.l = 0
"""


QUERIES = {
    "mm_bmp_phash_dct": (q_mm_bmp_phash_dct, SQL_MM_BMP_PHASH_DCT),
}


def q_mm_phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup GROUPS: bucket the corpus by its 15-bit DCT
    fingerprint and report every bucket with more than one image — the
    candidate groups an image-dedup pass reviews (the dhash banded-pairs
    pattern, but at the group grain: one row per collision bucket, never
    a pair explosion). Same plan as the hash pass plus one 15-bit-domain
    aggregate — the grouping key space is FIXED (32768), so the agg is
    map-side-combinable and skew-proof at any corpus size."""
    hashes = q_mm_bmp_phash_dct(spark, sf_dir)
    from pyspark.sql import functions as F

    return (
        hashes.groupBy("phash")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .filter("n_images > 1")
    )


SQL_MM_PHASH_DUP_GROUPS = f"""
SELECT phash,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM ({SQL_MM_BMP_PHASH_DCT})
GROUP BY phash
HAVING count(*) > 1
"""

QUERIES["mm_phash_dup_groups"] = (
    q_mm_phash_dup_groups,
    SQL_MM_PHASH_DUP_GROUPS,
)
