"""Empty-input robustness: every core operator must handle zero rows
(first batch of a stream, fully-filtered partitions) without error."""

from __future__ import annotations

from movie_data_transformer_spark.operators.merge import merge_flat
from movie_data_transformer_spark.operators.movie_pipeline import (
    dedup_latest,
    dedup_latest_maxby,
    explode_watched,
    group_watched,
    kv_serialize,
    run_pipeline,
)
from movie_data_transformer_spark.schemas import MOVIE_INPUT, RATING_FLAT


def _empty_movies(spark):
    return spark.createDataFrame([], MOVIE_INPUT)


def _empty_flat(spark):
    return spark.createDataFrame([], RATING_FLAT)


def _flat(spark, rows):
    return spark.createDataFrame(
        [(m, f"T_{m}", 2000, c, r, d) for (m, c, r, d) in rows], RATING_FLAT
    )


def test_pipeline_on_empty_input(spark):
    assert run_pipeline(_empty_movies(spark)).count() == 0


def test_dedup_variants_on_empty(spark):
    assert dedup_latest(_empty_flat(spark)).count() == 0
    assert dedup_latest_maxby(_empty_flat(spark)).count() == 0


def test_merge_empty_sides(spark):
    rows = [("m1", "c1", 3, "2024-01-01")]
    assert merge_flat(_empty_flat(spark), _flat(spark, rows)).count() == 1
    assert merge_flat(_flat(spark, rows), _empty_flat(spark)).count() == 1
    assert merge_flat(_empty_flat(spark), _empty_flat(spark)).count() == 0


def test_null_watchedby_drops_row(spark):
    # null list behaves like empty list under explode (not explode_outer)
    df = spark.createDataFrame(
        [{"movieId": "m", "title": "T", "yearOfRelease": 2000, "watchedBy": None}], MOVIE_INPUT
    )
    assert explode_watched(df).count() == 0


def test_kv_serialize_empty(spark):
    assert kv_serialize(group_watched(_empty_flat(spark))).count() == 0
