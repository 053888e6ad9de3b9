"""Continuous-ingest dedup: incremental MinHash linking as Structured
Streaming, with the corpus SHINGLE INDEX as the maintained state.

The batch operator (operators/dedup.incremental_minhash_pairs) links one
ingest batch against the existing corpus. This module runs that per
micro-batch over a file stream, the way a continuously crawled training
corpus actually operates:

  - state = the persisted shingle-index table (doc_id, shingles, hvals —
    dedup.doc_shingle_sets rows), versioned on parquet exactly like the
    merge pipeline's ParquetStateStore. Each doc is shingled ONCE, on the
    ingest that first sees it; later ingests read the index, never the
    text.
  - per micro-batch (foreachBatch): shingle the batch docs, link them
    against state+batch with incremental_minhash_pairs_from_sets, APPEND
    the verified pairs to a pairs log, and commit state+batch as the next
    index version.
  - the accumulated pairs log is EXACTLY the batch-form incremental
    result regardless of how files were sliced into micro-batches: a pair
    is emitted once, by the micro-batch of its later-ingested doc —
    pair-set equality with the full recompute is what the registry oracle
    checks (stream_incremental_dedup).

At 100 TB the index is an append-only table (Delta/Iceberg) partitioned
by doc hash, the pairs log is an append sink, and the per-ingest cost is
batch-sized: shingle |batch| docs + one (band, sig) join against the
index. Nothing here is driver-side; the versioned-parquet store is the
same poor man's commit protocol as merge_stream.py (pointer flip).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from movie_data_transformer_spark.operators.dedup import (
    doc_shingle_sets,
    incremental_minhash_pairs_from_sets,
)
from movie_data_transformer_spark.streaming.merge_stream import ParquetStateStore

#: JSONL schema of ingested documents (matches the documents table).
DOC_INPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def run_streaming_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    seed_docs: DataFrame,
    work_dir: str,
    max_files_per_trigger: int = 1,
    n: int = 3,
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
) -> str:
    """Stream JSONL doc files from input_dir in micro-batches, link each
    against the growing corpus index seeded from seed_docs, and return
    the path of the appended (doc_a, doc_b, jaccard) pairs log.

    Processes all currently available files then stops (availableNow),
    restartable via the checkpoint — same contract as
    run_incremental_merge."""
    store = ParquetStateStore(spark, os.path.join(work_dir, "index"))
    pairs_dir = os.path.join(work_dir, "pairs")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    store.commit(doc_shingle_sets(seed_docs, n=n))  # index v1: the seed corpus

    stream = (
        spark.readStream.schema(DOC_INPUT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.json")
        .option("mode", "DROPMALFORMED")
        .json(input_dir)
    )

    def _link_batch(batch_docs: DataFrame, batch_id: int) -> None:
        new_sets = doc_shingle_sets(batch_docs, n=n).persist()
        try:
            state_sets = store.read()
            pairs = incremental_minhash_pairs_from_sets(
                state_sets,
                new_sets,
                threshold=threshold,
                max_bucket_size=max_bucket_size,
            )
            pairs.write.mode("append").parquet(pairs_dir)
            store.commit(state_sets.unionByName(new_sets))
        finally:
            new_sets.unpersist(blocking=False)

    q = (
        stream.writeStream.foreachBatch(_link_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return pairs_dir
