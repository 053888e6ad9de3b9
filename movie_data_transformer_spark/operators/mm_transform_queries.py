"""Real pixel TRANSFORMS over decoded media (beyond decode-and-measure).

`mm_resize_nearest` upgrades the resize story from the fake-decoder
plan (multimodal.resize_media, schema/plumbing only) to a real pixel
resample: decode the 24-bit BMP, nearest-neighbor downscale to a fixed
4x4 target with the floor index mapping sx = (tx * w) DIV tw — pure
integer arithmetic, so the oracle recomputes the resized pixels from
the generative formula exactly and a wrong rounding convention, an
axis swap, or an off-by-one in the index map breaks the driver hash.

Scale: one mapInPandas projection (decode + numpy fancy-indexing per
blob), no shuffle; the per-image output is constant-size, which is what
a thumbnail/embedding preprocessing stage wants at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from movie_data_transformer_spark.operators.multimodal import (
    bmp_decode_pixels,
    synthesize_bmp_media,
)
from movie_data_transformer_spark.sources.tables import load_table

TARGET_W = 4
TARGET_H = 4

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", LongType()),
        StructField("src_h", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def q_mm_resize_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_bmp_media(docs)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                img = bmp_decode_pixels(bytes(blob))
                h, w = img.shape[:2]
                sx = (np.arange(TARGET_W) * w) // TARGET_W
                sy = (np.arange(TARGET_H) * h) // TARGET_H
                small = img[np.ix_(sy, sx)]
                out.append(
                    (
                        int(doc_id),
                        int(w),
                        int(h),
                        TARGET_W,
                        TARGET_H,
                        int(small[:, :, 0].sum()),
                        int(small[:, :, 1].sum()),
                        int(small[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.mapInPandas(resize, RESIZE_SCHEMA)


SQL_MM_RESIZE_NEAREST = """
WITH p AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 9 AS h
           FROM documents),
txs AS (SELECT doc_id, w, h, unnest(range(0, __TW__)) AS tx FROM p),
cell AS (SELECT doc_id, w, h, tx, unnest(range(0, __TH__)) AS ty FROM txs),
mapped AS (SELECT doc_id, w, h,
                  (tx * w) // __TW__ AS sx,
                  (ty * h) // __TH__ AS sy
           FROM cell),
px AS (SELECT doc_id, w, h,
              (doc_id * 7 + sx * 13 + sy * 31) % 256 AS r,
              (doc_id * 11 + sx * 17 + sy * 5) % 256 AS g,
              (doc_id * 3 + sx * 29 + sy * 23) % 256 AS b
       FROM mapped)
SELECT doc_id,
       CAST(w AS BIGINT) AS src_w,
       CAST(h AS BIGINT) AS src_h,
       CAST(__TW__ AS BIGINT) AS out_w,
       CAST(__TH__ AS BIGINT) AS out_h,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
""".replace("__TW__", str(TARGET_W)).replace("__TH__", str(TARGET_H))


QUERIES = {
    "mm_resize_nearest": (q_mm_resize_nearest, SQL_MM_RESIZE_NEAREST),
}
