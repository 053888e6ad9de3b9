"""Custom connector surface: Spark 4 Python DataSource API.

The reference's only "connectors" are a hand-rolled paginated S3 lister
(DataTransformationService.java:78-94) and a per-key Redis GET/SET sink
(DataTransformationService.java:176-195). The idiomatic Spark
counterpart is a pluggable DataSource: scans are split into partitions
Spark schedules like any file source, and writes go through the task
write -> driver commit protocol (temp files renamed on commit, removed
on abort) instead of unguarded per-key round-trips.

Two sources here:

- ``synthetic_ratings`` (reader): a deterministic partitioned ratings
  generator. Every field is integer arithmetic on the global row id, so
  a DuckDB ``range(n)`` expression reproduces it exactly — which makes a
  *custom connector* oracle-checkable end-to-end (registry entry
  `source_python_datasource`).
- ``kv_text`` (writer): the Redis-shaped KV sink re-expressed as a
  DataSource writer with the two-phase commit protocol. Each task
  writes ``key\\tvalue`` lines to a private temp file and reports it in
  its commit message; the driver renames all temp files into the target
  directory only when every task succeeded, and abort() deletes them —
  exactly-once output from at-least-once task attempts (the reference's
  retry path duplicates partial state instead, SURVEY.md §4.2).

Scale notes (100 TB): partitions() is the parallelism contract — the
generator splits its id range into `partitions` independent slices, so
throughput scales linearly with executors and no partition materializes
more than its slice. The KV writer holds one open file handle per task
and streams rows; commit is a driver-side O(#tasks) rename pass, the
same shape as a Hadoop FileOutputCommitter v1. A production variant
would target an object store / KV cluster with idempotent batched puts;
the local-FS rename here is the test harness stand-in (local[*] only —
on a real cluster executors don't share the driver's filesystem).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

EPOCH = date(2024, 1, 1)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticRatingsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            # Deterministic integer arithmetic only — mirrored verbatim by
            # the DuckDB range() oracle in operators/source_queries.py.
            yield (
                i,
                (i * 2654435761) % 97,
                (i * 40503) % 61,
                1 + (i * 7919) % 5,
                EPOCH + timedelta(days=i % 365),
            )


class SyntheticRatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings"

    def schema(self) -> str:
        return (
            "rating_id BIGINT, customer_id BIGINT, movie_id BIGINT, "
            "rating INT, rating_date DATE"
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticRatingsReader(self.options)


@dataclass
class _KVCommitMessage(WriterCommitMessage):
    temp_path: str
    n_rows: int


class KVTextWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.key_col = options.get("key_col", "key")
        self.value_col = options.get("value_col", "value")
        # job id is minted ONCE on the driver and pickled to every task,
        # so all attempts (including failed ones that never report a
        # commit message) land under one job temp dir that commit/abort
        # can remove wholesale — no orphaned temp files.
        self.job_id = uuid.uuid4().hex

    def _job_tmp(self) -> str:
        return os.path.join(self.path, "_temporary", self.job_id)

    def write(self, rows: Iterator[Any]) -> _KVCommitMessage:
        os.makedirs(self._job_tmp(), exist_ok=True)
        temp = os.path.join(self._job_tmp(), f"task-{uuid.uuid4().hex}.tsv")
        n = 0
        with open(temp, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(f"{row[self.key_col]}\t{row[self.value_col]}\n")
                n += 1
        return _KVCommitMessage(temp_path=temp, n_rows=n)

    def _cleanup(self) -> None:
        # remove the ENTIRE _temporary tree, not just this job's subdir:
        # a straggler task can re-create its job dir AFTER the driver's
        # abort ran (same race FileOutputCommitter has), so stale job
        # dirs from a previous failed write may exist — and concurrent
        # jobs into one KV dir are unsupported anyway (part-file names
        # would collide). Stale temp state is therefore swept by the
        # next job's commit/abort; readers never see it (underscore
        # prefix). The abort-then-succeed sequence is pinned in
        # tests/test_sources_extras.py.
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def commit(self, messages: Sequence[_KVCommitMessage]) -> None:
        for idx, msg in enumerate(messages):
            final = os.path.join(self.path, f"part-{idx:05d}.tsv")
            os.replace(msg.temp_path, final)
        self._cleanup()

    def abort(self, messages: Sequence[_KVCommitMessage]) -> None:
        self._cleanup()


class KVTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kv_text"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return KVTextWriter(self.options)


def register_datasources(spark) -> None:
    """Idempotent registration of both custom sources."""
    spark.dataSource.register(SyntheticRatingsDataSource)
    spark.dataSource.register(KVTextDataSource)
