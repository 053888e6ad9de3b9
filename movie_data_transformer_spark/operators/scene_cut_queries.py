"""Shot-boundary (scene-cut) detection over the AVI fixture — the video
tier's first ANALYSIS operator beyond decode/sample: per consecutive
frame pair, the exact integer sum of absolute per-pixel differences and
a threshold cut decision. This is the standard pixel-delta shot detector
(the baseline every video-segmentation paper starts from), and the
canonical pre-processing step a video training pipeline runs to pick
clip boundaries before frame sampling (mm_avi_frame_sample).

The Spark side decodes REAL RIFF/AVI bytes frame-by-frame
(multimodal.avi_scene_cuts — mapInPandas, media never shuffles); the
DuckDB oracle recomputes the identical deltas from the planted pixel
formula (the mm_avi_decode discipline: a chunk-walk slip, frame-order
bug, or channel swap breaks the hash).

Entry `mm_avi_scene_cuts` (FULL DuckDB oracle): per (doc, frame_idx >=
1) — delta_sum, mean_delta_milli (delta * 1000 // (w*h*3)), is_cut
(mean >= 100_000 milli, i.e. average per-cell change >= 100 of 255).

Scale: one mapInPandas decode pass, output rows = frames-1 per clip —
the follow-on aggregation (cuts per clip) is a trivial doc-keyed agg.
Decode cost dominates; cuts add one subtraction per pixel over the
decode the features pass already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.multimodal import (
    avi_scene_cuts,
    synthesize_avi_media,
)
from movie_data_transformer_spark.sources.tables import load_table

THRESH_MILLI = 100_000


def q_mm_avi_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return avi_scene_cuts(synthesize_avi_media(docs), THRESH_MILLI)


SQL_MM_AVI_SCENE_CUTS = f"""
WITH p AS (SELECT doc_id, 4 + doc_id % 8 AS w, 4 + doc_id % 6 AS h,
                  2 + doc_id % 4 AS nf
           FROM documents),
fr AS (SELECT doc_id, w, h, nf, unnest(range(1, nf)) AS f FROM p),
xs AS (SELECT doc_id, w, h, nf, f, unnest(range(0, w)) AS x FROM fr),
cell AS (SELECT doc_id, w, h, nf, f, x, unnest(range(0, h)) AS y FROM xs),
px AS (SELECT doc_id, w, h, f,
              abs((doc_id * 5 + f * 19 + x * 7 + y * 3) % 256
                  - (doc_id * 5 + (f - 1) * 19 + x * 7 + y * 3) % 256) AS dr,
              abs((doc_id * 13 + f * 23 + x * 3 + y * 11) % 256
                  - (doc_id * 13 + (f - 1) * 23 + x * 3 + y * 11) % 256) AS dg,
              abs((doc_id * 17 + f * 29 + x * 19 + y * 7) % 256
                  - (doc_id * 17 + (f - 1) * 29 + x * 19 + y * 7) % 256) AS db
       FROM cell),
agg AS (
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(sum(dr + dg + db) AS BIGINT) AS delta_sum,
           CAST(sum(dr + dg + db) * 1000 // (max(w) * max(h) * 3) AS BIGINT)
               AS mean_delta_milli
    FROM px GROUP BY doc_id, f
)
SELECT doc_id, frame_idx, delta_sum, mean_delta_milli,
       CAST(mean_delta_milli >= {THRESH_MILLI} AS INT) AS is_cut
FROM agg
"""


QUERIES = {
    "mm_avi_scene_cuts": (q_mm_avi_scene_cuts, SQL_MM_AVI_SCENE_CUTS),
}
