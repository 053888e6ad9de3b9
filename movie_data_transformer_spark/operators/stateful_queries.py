"""Registry entry for the applyInPandasWithState custom stateful
operator (streaming/stateful.py) — binding oracle evidence for the
engine's arbitrary-stateful-processing surface.

The reference's only stateful loop is the serial driver-side Redis
read-modify-write (DataTransformationService.java:180-193). Here the
state is Spark-owned (partition-local, checkpointed, RocksDB-spillable)
and the operator is exercised as a REAL Structured Streaming run, not a
batch stand-in: events stream through availableNow triggers, every
micro-batch's update-mode emissions are appended to parquet via
foreachBatch (a distributed write — no memory-sink driver collect), and
the final answer takes each key's last emission (arg-max on the
monotonically growing n_events). Because the updater accumulates exact
integer cents and tie-breaks "latest" on the total order (ts, event_id),
the final state equals the batch aggregate for EVERY micro-batch slicing
— which is exactly what the DuckDB oracle recomputes.

Scale: state and emissions are per-key rows; each micro-batch touches
only the keys it contains, the sink append is O(|batch keys|), and the
finalization is one shuffle on user_id over the emissions log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_events_stream
from movie_data_transformer_spark.streaming.harness import run_availablenow_to_df
from movie_data_transformer_spark.streaming.stateful import running_user_totals_exact


def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = load_events_stream(spark, sf_dir, raw_ns=True, maxFilesPerTrigger="1")

    # final state per key = the last (largest-n_events) emission
    def _finalize(emissions: DataFrame) -> DataFrame:
        return (
            emissions.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("n_events", "sum_value_cents", "last_event_type"),
                    F.col("n_events"),
                ).alias("s")
            )
            .select("user_id", "s.*")
        )

    return run_availablenow_to_df(
        running_user_totals_exact(stream), "update", "mdt_stateful_", _finalize
    )


SQL_STREAM_STATEFUL_TOTALS = """
WITH base AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM events
),
latest AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM base
)
SELECT b.user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(b.cents) AS BIGINT) AS sum_value_cents,
       max(l.event_type) AS last_event_type
FROM base b JOIN latest l ON b.user_id = l.user_id AND l.rn = 1
GROUP BY b.user_id
"""


def q_stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFLINE STATE INSPECTION: run the same stateful stream, then read
    its checkpoint back through Spark 4's state-store reader
    (format("statestore")) and project the per-user state — no replay,
    no emissions log, just the committed state itself. Held to the SAME
    batch-aggregate oracle as stream_stateful_totals, which binds the
    operational claim that the state a 100 TB pipeline carries can be
    audited/debugged offline and equals the batch truth.

    Scale: the reader scans the last committed snapshot per shuffle
    partition in parallel (one task per state partition) — state-sized
    I/O, no reprocessing of the event log."""
    stream = load_events_stream(spark, sf_dir, raw_ns=True, maxFilesPerTrigger="1")

    def _read_state(ckpt: str) -> DataFrame:
        return (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.groupState.n_events").alias("n_events"),
                F.col("value.groupState.sum_cents").alias("sum_value_cents"),
                F.col("value.groupState.last_event_type").alias("last_event_type"),
            )
        )

    return run_availablenow_to_df(
        running_user_totals_exact(stream),
        "update",
        "mdt_stinspect_",
        result_from_ckpt=_read_state,
    )


QUERIES = {
    "stream_stateful_totals": (q_stream_stateful_totals, SQL_STREAM_STATEFUL_TOTALS),
    "stream_state_inspect": (q_stream_state_inspect, SQL_STREAM_STATEFUL_TOTALS),
}
