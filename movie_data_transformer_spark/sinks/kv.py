"""Keyed-JSON KV sink (reference op 17): ship (key, value) rows to a KV
store from the executors.

Reference: saveToMemoryDB writes per-customer JSON blobs to Redis with
serial per-key GET/SET on the driver thread
(DataTransformationService.java:176-195, RedisConfig.java:23-30). Here the
write runs via foreachPartition — every partition opens ONE client and
pipelines its keys, so sink throughput scales with executors and there are
no per-key round-trips from a single coordinator (SURVEY.md §4.2).

The client is pluggable: anything with set(key, value)/close(). The
factory is called per partition ON THE EXECUTOR (it must be picklable and
must not capture a live connection). FileKVClient — an atomic
file-per-partition implementation — serves tests and codec-less
environments; a Redis deployment plugs `lambda: redis.Redis(...)` in
unchanged.
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Callable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame, Row


class KVClient(Protocol):
    def set(self, key: str, value: str) -> None: ...

    def close(self) -> None: ...


class FileKVClient:
    """Atomic file-backed KV client: each partition writes one
    `part-<uuid>.kv` file of tab-separated key/value lines (tmp + rename,
    so concurrent readers never see partial files). Last-writer-wins per
    key on read — same as Redis SET."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tmp = os.path.join(root, f".tmp-{uuid.uuid4().hex}")
        self._out = open(self._tmp, "w")

    def set(self, key: str, value: str) -> None:
        self._out.write(f"{key}\t{value}\n")

    def close(self) -> None:
        self._out.close()
        # commit-time prefix makes read_all's name-sorted replay
        # chronological, so a key published by a LATER batch wins — a bare
        # uuid name made the winner random across batches
        name = f"part-{time.time_ns():020d}-{uuid.uuid4().hex}.kv"
        os.replace(self._tmp, os.path.join(self.root, name))

    @staticmethod
    def read_all(root: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for name in sorted(os.listdir(root)):
            if name.endswith(".kv"):
                with open(os.path.join(root, name)) as f:
                    for line in f:
                        k, _, v = line.rstrip("\n").partition("\t")
                        out[k] = v
        return out


def write_kv(kv_df: DataFrame, client_factory: Callable[[], KVClient]) -> None:
    """Write a (key, value) DataFrame through per-partition KV clients."""

    def _write(rows: Iterator[Row]) -> None:
        client = client_factory()
        try:
            for row in rows:
                client.set(row["key"], row["value"])
        finally:
            client.close()

    kv_df.foreachPartition(_write)
