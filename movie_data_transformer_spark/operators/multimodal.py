"""Multimodal column pattern (SURVEY.md §7 M5): image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
Pandas UDFs.

The container has no image/audio codecs, so the DECODE step is stubbed
(raises NotImplementedError unless `fake=True` uses the deterministic
fake decoder) — but everything Spark-side is real and tested: the schema
contract, the mapInPandas batch shape, partition sizing, and the feature
pipeline. Swapping the stub for PIL/ffmpeg changes one function.

Scale notes: binary payloads ride in parquet binary columns; decode/
feature-extract run as mapInPandas over Arrow record batches, so Python
touches columnar buffers (no per-row serialization). Partition sizing for
blobs: keep `spark.sql.files.maxPartitionBytes` at default 128MB so a
task holds ~100 x 1MB blobs; never collect() media to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the typed media column contract: opaque bytes + declared metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|wav|mp4|...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table: content = utf-8 bytes
    of the text (a stand-in payload with real, variable-length binary),
    metadata derived deterministically. This exercises the exact schema &
    plumbing a real image/audio table would use."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")), (F.col("doc_id") % 3 + 1).cast("int")).alias("format"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_media(content: bytes, fmt: str, fake: bool = False) -> bytes:
    """STUB: real deployments plug PIL/soundfile/ffmpeg in here.
    fake=True returns a deterministic pseudo-decode (the identity) so the
    downstream plumbing is testable in codec-less environments."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True (tests) or plug a real decoder (PIL/ffmpeg)"
        )
    return content


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas. The fake feature is a deterministic byte histogram folded
    to FEATURE_DIM buckets — stands in for an image/audio embedding while
    exercising identical batch shapes.

    Normalization is EXACT INTEGER micro-units ((count * 10^6) // total,
    then one IEEE division by 10^6): no float rounding call anywhere, so
    the values are bit-reproducible across engines and the registry entry
    carries a full DuckDB oracle instead of a rows-only check (cf. the
    round(double, n) midpoint pitfall in NOTES.md)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, fmt in zip(pdf["content"], pdf["format"]):
                decoded = decode_media(content, fmt, fake=fake_decode)
                buckets = [0] * FEATURE_DIM
                for byte in decoded:
                    buckets[byte % FEATURE_DIM] += 1
                total = max(len(decoded), 1)
                feats.append([(b * 1000000) // total / 1e6 for b in buckets])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, target_w: int, target_h: int, fake_decode: bool = True) -> DataFrame:
    """STUB of image resize: the metadata plan (aspect-preserving scale
    factor, output dims) is real Spark-side arithmetic; the pixel
    resample runs through the decode gate (PIL would slot into
    decode_media). Emits the resized payload untouched under the fake
    decoder — the schema/batch contract is what downstream code binds to."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = [
                decode_media(c, f, fake=fake_decode)
                for c, f in zip(pdf["content"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": out_content,
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    images = media.filter(F.col("media_type") == "image")
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"), F.lit(float(target_h)) / F.col("height")
    )
    planned = images.withColumn("out_w", (F.col("width") * scale).cast("int")).withColumn(
        "out_h", (F.col("height") * scale).cast("int")
    )
    resized = planned.select("doc_id", "content", "media_type", "format", "width", "height").mapInPandas(
        _resize,
        schema="doc_id long, content binary, width int, height int",
    )
    return resized.join(
        planned.select("doc_id", "out_w", "out_h", F.round(scale, 6).alias("scale")),
        "doc_id",
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB of video frame sampling: the real implementation would emit
    one row per sampled frame (mapInPandas fan-out). Here: videos only,
    with the frame plan computed from metadata — the Spark-side row
    explosion is real, the pixel decode is not."""
    videos = media.filter(F.col("media_type") == "video")
    n_frames = (F.col("n_bytes") / 100 + 1).cast("int")  # fake duration model
    return videos.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
        "width",
        "height",
    )
