"""Registry entry for the stream-stream join (streaming/joins.py) —
binding oracle evidence for the two-continuous-inputs surface.

`range_join_conversions` answers view->purchase conversion attribution as
a batch range join; this entry runs the SAME semantics as a REAL
Structured Streaming stream-stream inner join (two independent streaming
sources, watermark-bounded state on both sides, append-mode emissions
through foreachBatch to parquet — no memory-sink driver collect) and is
held to the SAME DuckDB oracle, because an inner stream-stream join's
emitted set equals the batch join for any arrival order in which
watermark eviction never outruns a pending match (availableNow over the
source file guarantees that here; the multi-slicing equivalence is
tests/test_stream_stream_join.py).

Scale: both sides' state is watermark-evicted (a view older than the
20-minute horizon can never match a future purchase), so state is
bounded by the event rate x horizon, not the corpus; the join itself
shuffles both streams on user_id exactly like the batch form.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.temporal_queries import (
    SQL_RANGE_JOIN_CONVERSIONS,
)
from movie_data_transformer_spark.sources.tables import load_events_stream
from movie_data_transformer_spark.streaming.joins import stream_conversions


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = load_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    purchases = load_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    work = tempfile.mkdtemp(prefix="mdt_ssj_")
    out = os.path.join(work, "emissions")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_conversions(views, purchases, 600)
        .writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_sink)
        .start()
    )
    q.awaitTermination()
    stable = tempfile.mkdtemp(prefix="mdt_ssj_final_")
    spark.read.parquet(out).write.mode("overwrite").parquet(stable)
    shutil.rmtree(work, ignore_errors=True)
    return spark.read.parquet(stable)


QUERIES = {
    "stream_stream_join": (q_stream_stream_join, SQL_RANGE_JOIN_CONVERSIONS),
}
