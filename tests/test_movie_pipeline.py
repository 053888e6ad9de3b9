"""Semantic edge-case tests — one per SURVEY.md §2.2 item.

The reference behaviors being pinned (file:line cites in SURVEY.md §2.2):
empty watchedBy drops rows; dedup key is movieId alone; latest date wins;
malformed date loses; nested movie-id is dead data; missing rating -> 0.
"""

from __future__ import annotations

import json

from movie_data_transformer_spark.fixtures import derive_movies, edge_movies
from movie_data_transformer_spark.operators.movie_pipeline import (
    dedup_latest,
    explode_watched,
    group_watched,
    kv_serialize,
    run_pipeline,
)


def _flat(spark):
    return explode_watched(edge_movies(spark))


def test_empty_watchedby_drops_rows(spark):
    # §2.2 item 6: explode, not explode_outer
    flat = _flat(spark)
    assert flat.filter(flat.movieId == "m_empty").count() == 0


def test_dedup_keeps_latest_date(spark):
    rows = dedup_latest(_flat(spark)).filter("movieId = 'm_dup'").collect()
    assert len(rows) == 1
    assert rows[0]["date"] == "2024-02-02" and rows[0]["rating"] == 5


def test_dedup_tie_on_date_is_deterministic(spark):
    # Intra-batch tie: deterministic winner (rating desc tiebreak).
    # (The reference's existing-wins tie rule applies to the stateful
    # merge, covered in test_merge_semantics.py.)
    rows = dedup_latest(_flat(spark)).filter("movieId = 'm_tie'").collect()
    assert len(rows) == 1
    assert rows[0]["rating"] == 4


def test_malformed_date_loses(spark):
    # §2.2 item 3: unparseable date sorts NULLS LAST -> parseable wins
    rows = dedup_latest(_flat(spark)).filter("movieId = 'm_bad'").collect()
    assert len(rows) == 1
    assert rows[0]["date"] == "2024-04-04"


def test_nested_movie_id_is_dead_data(spark):
    # §2.2 item 5: parent movieId wins over nested movie-id
    rows = _flat(spark).filter("customerId = 'c4'").collect()
    assert len(rows) == 1
    assert rows[0]["movieId"] == "m_parent"


def test_missing_rating_defaults_to_zero_and_title_null(spark):
    # §2.2 item 9: Java-int default 0; missing strings stay null
    rows = _flat(spark).filter("movieId = 'm_miss'").collect()
    assert len(rows) == 1
    assert rows[0]["rating"] == 0
    assert rows[0]["title"] is None


def test_kv_blob_shape(spark):
    kv = kv_serialize(group_watched(dedup_latest(_flat(spark)))).collect()
    by_key = {r["key"]: json.loads(r["value"]) for r in kv}
    assert set(by_key) == {"customer:c1", "customer:c2", "customer:c3", "customer:c4", "customer:c5"}
    c1 = by_key["customer:c1"]
    assert c1["customerId"] == "c1"
    assert c1["watchedMovies"] == [
        {
            "movieId": "m_dup",
            "title": "DUP",
            "yearOfRelease": 2001,
            "rating": 5,
            "date": "2024-02-02",
        }
    ]


def test_full_pipeline_on_sf0001(spark, sf_dir):
    out = run_pipeline(derive_movies(spark, sf_dir))
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"key", "value"}
    assert all(r["key"].startswith("customer:") for r in rows)
