"""Source/state-store unit coverage: corrupt-line extraction, version
pruning."""

from __future__ import annotations

import json
import os

from movie_data_transformer_spark.sources.jsonl import corrupt_records, read_movies_jsonl
from movie_data_transformer_spark.streaming.merge_stream import ParquetStateStore


def test_corrupt_records_extraction(spark, tmp_path):
    d = tmp_path / "jsonl"
    d.mkdir()
    good = {"movieId": "m1", "title": "T", "yearOfRelease": 2000, "watchedBy": []}
    (d / "a.json").write_text(json.dumps(good) + "\nBROKEN {{{\n" + json.dumps(good) + "\n")
    (d / "skip.txt").write_text("NOT SCANNED {{{\n")
    assert read_movies_jsonl(spark, str(d)).count() == 2
    bad = [r.raw_line for r in corrupt_records(spark, str(d)).collect()]
    assert bad == ["BROKEN {{{"]


def test_state_store_prunes_old_versions(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"))
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    for _ in range(6):
        store.commit(df)
    assert store.current_version() == 6
    versions = sorted(
        int(n[1:]) for n in os.listdir(store.root) if n.startswith("v") and n[1:].isdigit()
    )
    # retain window: current + 2 prior
    assert versions == [4, 5, 6]
    assert store.read().count() == 3
