"""KV sink: foreachPartition write path (reference op 17's sink, executed
executor-side instead of serial driver GET/SET)."""

from __future__ import annotations

import json

from movie_data_transformer_spark.fixtures import derive_movies
from movie_data_transformer_spark.operators.movie_pipeline import run_pipeline
from movie_data_transformer_spark.sinks import FileKVClient, write_kv


def test_write_kv_round_trip(spark, sf_dir, tmp_path):
    kv = run_pipeline(derive_movies(spark, sf_dir))
    root = str(tmp_path / "kvstore")
    write_kv(kv, lambda: FileKVClient(root))
    stored = FileKVClient.read_all(root)
    expect = {r["key"]: r["value"] for r in kv.collect()}
    assert stored == expect and len(stored) > 0
    # values are valid CustomerMovie JSON blobs
    blob = json.loads(next(iter(stored.values())))
    assert set(blob) == {"customerId", "watchedMovies"}
