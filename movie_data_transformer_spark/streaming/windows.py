"""Event-time windowed aggregation (SURVEY.md §7 M4).

The reference has only arrival-time micro-batching (op 12) and a
last-write-wins late-data policy (ops 10-11). These operators are the
principled event-time generalization: tumbling/sliding/session windows and
keyed deduplication, written against the DataFrame API so the SAME
function runs in batch (oracle-checkable, deterministic replay) and in
Structured Streaming (with withWatermark bounding state).

Window starts are emitted as epoch seconds (BIGINT): timezone-independent
for oracle comparison, and Spark's window() aligns tumbling/sliding
buckets to the epoch, so `floor(epoch/width)*width` is the exact ANSI
equivalent.

Scale: a streaming tumbling agg is a partial-agg -> shuffle-by
(key, window) -> final-agg with state eviction by watermark; bounded
state per key*window, no driver involvement. Session windows use Spark's
built-in session_window (state merges adjacent sessions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _win_start_epoch(win: Column) -> Column:
    return F.unix_timestamp(win["start"]).alias("bucket_start")


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per event_type tumbling-window counts + exact value sums."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            # final projection: exact decimal -> double (DecimalType in a
            # registry result breaks the driver's pandas canon; see
            # functions.core.money_out)
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping buckets."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessionization with a fixed inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Keyed dedup: first event per (user, type, day). Batch == DISTINCT on
    the keys; streaming == dropDuplicates bounded by a watermark."""
    keyed = events.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return keyed.dropDuplicates(["user_id", "event_type", "day"])


def streaming_tumbling_counts(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """The streaming form of tumbling_counts: watermark bounds state and
    defines the late-data policy (events older than the watermark are
    dropped — the event-time upgrade of the reference's LWW policy)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            # final projection: exact decimal -> double (DecimalType in a
            # registry result breaks the driver's pandas canon; see
            # functions.core.money_out)
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )
