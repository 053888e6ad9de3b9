"""Event-time windows: the streaming form must equal the batch replay."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from movie_data_transformer_spark.sources.tables import load_table
from movie_data_transformer_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_counts,
)

EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos (nanosAsLong read)
        StructField("user_id", LongType()),
        StructField("event_type", __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()),
        StructField("value", __import__("pyspark.sql.types", fromlist=["DoubleType"]).DoubleType()),
        StructField("props", __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()),
    ]
)


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # streaming file source wants a directory; glob down to the events file
    stream = (
        spark.readStream.schema(EVENTS_RAW)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    )
    agg = streaming_tumbling_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from tumbling_test").collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour").collect()
    }
    assert got == want and len(got) > 0
