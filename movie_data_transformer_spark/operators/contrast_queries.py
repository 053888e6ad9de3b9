"""Image-quality screening — low-contrast detection over the decoded
BMP tier: the LAION-style visual quality gate a multimodal curation
pipeline runs right after decode (flat/near-uniform images carry no
training signal). Luma is the integer 2r+5g+b weighting (x8-scaled
BT.601 rational, no doubles), contrast is the EXACT population-variance
numerator n*sum(l^2) - sum(l)^2, and the flag cross-multiplies
(var_num * 1000 < thresh_milli * n^2) so the decision needs no division
anywhere. The Spark side decodes REAL BMP bytes
(multimodal.bmp_contrast_stats, mapInPandas); the oracle recomputes
from the planted pixel formula (the mm_bmp_decode discipline).

Entry `mm_bmp_contrast_stats` (FULL DuckDB oracle): per doc — n_px,
sum_luma, var_num, is_low_contrast (threshold 146_000 luma8^2-units,
i.e. milli 146_000_000 — the fixture's median per-pixel variance, so
BOTH flag values occur in balance, pinned in pytest).

Scale: one mapInPandas decode pass, one row per image out; the decode
dominates and the stats ride the pass for free. Media never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.multimodal import (
    bmp_contrast_stats,
    synthesize_bmp_media,
)
from movie_data_transformer_spark.sources.tables import load_table

VAR_MILLI_THRESH = 146_000_000


def q_mm_bmp_contrast_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bmp_contrast_stats(synthesize_bmp_media(docs), VAR_MILLI_THRESH)


SQL_MM_BMP_CONTRAST_STATS = f"""
WITH p AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 9 AS h
           FROM documents),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM p),
cell AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
px AS (SELECT doc_id, w, h,
              2 * ((doc_id * 7 + x * 13 + y * 31) % 256)
              + 5 * ((doc_id * 11 + x * 17 + y * 5) % 256)
              + ((doc_id * 3 + x * 29 + y * 23) % 256) AS l
       FROM cell),
agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(l) AS BIGINT) AS sum_luma,
           CAST(count(*) * sum(l * l) - sum(l) * sum(l) AS BIGINT) AS var_num
    FROM px GROUP BY doc_id
)
SELECT doc_id, n_px, sum_luma, var_num,
       CAST(var_num * 1000 < {VAR_MILLI_THRESH} * n_px * n_px AS INT)
           AS is_low_contrast
FROM agg
"""


QUERIES = {
    "mm_bmp_contrast_stats": (
        q_mm_bmp_contrast_stats,
        SQL_MM_BMP_CONTRAST_STATS,
    ),
}
