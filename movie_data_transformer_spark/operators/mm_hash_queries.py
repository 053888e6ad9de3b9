"""Perceptual image hashing over decoded pixels: dHash (difference
hash), the standard cheap near-duplicate-image fingerprint — the visual
analogue of SimHash for text. Downsample to a (W+1) x H grayscale grid
with the same floor nearest-neighbor index map as mm_resize_nearest,
then emit one bit per horizontally-adjacent comparison (gray[x] <
gray[x+1]); images differing by compression artifacts, mild rescaling,
or small edits land within a few Hamming bits, so at 100 TB the hash
feeds the exact same banded-LSH pair machinery the text SimHash path
uses (dedup.simhash_near_pairs over 64-bit fingerprints).

Everything is exact integer arithmetic — BT.601 luma as
(299 r + 587 g + 114 b) DIV 1000, floor index maps, bit assembly as two
unsigned 32-bit halves in bigints (no sign-bit dance) — so the entry
recomputes bit-for-bit from the BMP generative pixel formula in DuckDB
(FULL oracle): a wrong luma rounding, axis swap, or off-by-one in the
9-column sampling breaks the driver hash.

Scale: decode + hash is one mapInPandas projection per blob, no
shuffle; the result is 3 bigints per image.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.multimodal import (
    bmp_decode_pixels,
    synthesize_bmp_media,
)
from movie_data_transformer_spark.sources.tables import load_table

DH_W = 8  # 8 comparison bits per row -> 9 sampled columns
DH_H = 8


def dhash_rows(media: DataFrame) -> DataFrame:
    """(doc_id, src_w, src_h, hash_hi, hash_lo): 64-bit dHash split into
    two unsigned 32-bit halves (bit k of the hash = row-major comparison
    ty * DH_W + tx; k in [32, 64) lands in hash_hi at k - 32)."""
    import pandas as pd

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                img = bmp_decode_pixels(bytes(blob)).astype(np.int64)
                h, w = img.shape[:2]
                sx = (np.arange(DH_W + 1) * w) // (DH_W + 1)
                sy = (np.arange(DH_H) * h) // DH_H
                cell = img[np.ix_(sy, sx)]
                gray = (
                    299 * cell[:, :, 0] + 587 * cell[:, :, 1] + 114 * cell[:, :, 2]
                ) // 1000
                bits = (gray[:, :-1] < gray[:, 1:]).astype(np.int64)  # (DH_H, DH_W)
                k = np.arange(DH_H * DH_W, dtype=np.int64).reshape(DH_H, DH_W)
                w_lo = np.where(k < 32, np.int64(1) << np.minimum(k, 31), 0)
                w_hi = np.where(k >= 32, np.int64(1) << np.maximum(k - 32, 0), 0)
                lo = int((bits * w_lo).sum())
                hi = int((bits * w_hi).sum())
                out.append((int(doc_id), int(w), int(h), hi, lo))
            yield pd.DataFrame(
                out, columns=["doc_id", "src_w", "src_h", "hash_hi", "hash_lo"]
            )

    return media.mapInPandas(
        _hash,
        schema="doc_id long, src_w long, src_h long, hash_hi long, hash_lo long",
    )


def q_mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dhash_rows(synthesize_bmp_media(load_table(spark, sf_dir, "documents")))


SQL_MM_IMAGE_DHASH = """
WITH p AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 9 AS h
           FROM documents),
txs AS (SELECT doc_id, w, h, unnest(range(0, __W__)) AS tx FROM p),
cell AS (SELECT doc_id, w, h, tx, unnest(range(0, __H__)) AS ty FROM txs),
m AS (SELECT doc_id, w, h, tx, ty,
             (tx * w) // (__W__ + 1) AS sxa,
             ((tx + 1) * w) // (__W__ + 1) AS sxb,
             (ty * h) // __H__ AS sy
      FROM cell),
g AS (SELECT doc_id, w, h, ty * __W__ + tx AS k,
             (299 * ((doc_id * 7 + sxa * 13 + sy * 31) % 256)
            + 587 * ((doc_id * 11 + sxa * 17 + sy * 5) % 256)
            + 114 * ((doc_id * 3 + sxa * 29 + sy * 23) % 256)) // 1000 AS ga,
             (299 * ((doc_id * 7 + sxb * 13 + sy * 31) % 256)
            + 587 * ((doc_id * 11 + sxb * 17 + sy * 5) % 256)
            + 114 * ((doc_id * 3 + sxb * 29 + sy * 23) % 256)) // 1000 AS gb
      FROM m),
bits AS (SELECT doc_id, w, h, k,
                CASE WHEN ga < gb THEN 1 ELSE 0 END AS bit FROM g)
SELECT doc_id,
       CAST(w AS BIGINT) AS src_w,
       CAST(h AS BIGINT) AS src_h,
       CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END)
            AS BIGINT) AS hash_hi,
       CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END)
            AS BIGINT) AS hash_lo
FROM bits
GROUP BY doc_id, w, h
""".replace("__W__", str(DH_W)).replace("__H__", str(DH_H))


QUERIES = {
    "mm_image_dhash": (q_mm_image_dhash, SQL_MM_IMAGE_DHASH),
}
