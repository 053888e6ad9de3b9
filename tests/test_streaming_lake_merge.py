"""Streaming upsert into a partitioned parquet lake table:
readStream -> foreachBatch(merge_into_partitioned). The streaming
counterpart of the reference's incremental merge, but the state is an
open lake table (partition-pruned rewrite) instead of a KV store."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from movie_data_transformer_spark.sinks.table import merge_into_partitioned


def _write_jsonl(path, name, rows):
    (path / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_stream_foreachbatch_merges_into_lake(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    lake = str(tmp_path / "lake")

    # seed the lake with initial state: two partitions, seq 0
    seed = spark.createDataFrame(
        [(1, "a", 10.0, 0), (2, "a", 20.0, 0), (3, "b", 30.0, 0)],
        "key long, part string, val double, seq long",
    )
    seed.write.partitionBy("part").parquet(lake)

    # two micro-batch files: an update for key 1 (newer seq), a stale
    # update for key 3 (older-or-equal seq loses is LWW by seq: equal
    # seq keeps the larger by orderBy desc -> make it strictly lower),
    # and an insert in a brand-new partition
    _write_jsonl(inp, "b1.json", [{"key": 1, "part": "a", "val": 11.0, "seq": 1}])
    _write_jsonl(
        inp,
        "b2.json",
        [
            {"key": 4, "part": "c", "val": 40.0, "seq": 1},
            {"key": 3, "part": "b", "val": 99.0, "seq": -1},
        ],
    )

    stream = spark.readStream.schema("key long, part string, val double, seq long").option(
        "maxFilesPerTrigger", 1
    ).json(str(inp))

    def upsert(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        merge_into_partitioned(
            batch_df.sparkSession, lake, batch_df, ["key"], "part", "seq"
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.key: (r.part, r.val) for r in spark.read.parquet(lake).collect()}
    assert got == {
        1: ("a", 11.0),  # updated by the newer seq
        2: ("a", 20.0),  # untouched
        3: ("b", 30.0),  # stale update lost LWW
        4: ("c", 40.0),  # insert created a new partition
    }
