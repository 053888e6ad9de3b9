"""As-of join and range join semantics on literal fixtures."""

from __future__ import annotations

from datetime import datetime

from movie_data_transformer_spark.operators.temporal import asof_join, range_join


def _df(spark, rows, schema="event_id long, user_id long, ts timestamp, value double"):
    return spark.createDataFrame(rows, schema)


TS = datetime


def test_asof_inclusive_at_equal_ts_and_null_when_no_prior(spark):
    purchases = _df(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0), (2, 7, TS(2024, 1, 1, 9, 0, 0), 0.0)])
    views = _df(spark, [(10, 7, TS(2024, 1, 1, 10, 0, 0), 5.5), (11, 7, TS(2024, 1, 1, 9, 30, 0), 3.3)])
    out = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            purchases, views, "user_id", "ts", "ts", ["event_id", "value"], right_seq="event_id"
        ).collect()
    }
    assert out[1] == (10, 5.5)  # equal ts -> inclusive match
    assert out[2] == (None, None)  # nothing at-or-before 09:00


def test_asof_tie_break_is_latest_seq(spark):
    purchases = _df(spark, [(1, 7, TS(2024, 1, 1, 12, 0, 0), 0.0)])
    views = _df(
        spark,
        [(10, 7, TS(2024, 1, 1, 11, 0, 0), 1.0), (11, 7, TS(2024, 1, 1, 11, 0, 0), 2.0)],
    )
    out = asof_join(
        purchases, views, "user_id", "ts", "ts", ["event_id", "value"], right_seq="event_id"
    ).collect()[0]
    assert out.asof_event_id == 11  # highest seq among equal timestamps


def test_range_join_bounds(spark):
    views = _df(spark, [(1, 7, TS(2024, 1, 1, 10, 0, 0), 0.0)])
    purchases = _df(
        spark,
        [
            (20, 7, TS(2024, 1, 1, 10, 0, 0), 0.0),   # equal ts -> excluded (strict lower)
            (21, 7, TS(2024, 1, 1, 10, 5, 0), 0.0),   # within window
            (22, 7, TS(2024, 1, 1, 10, 10, 0), 0.0),  # exactly at bound -> included
            (23, 7, TS(2024, 1, 1, 10, 10, 1), 0.0),  # past bound -> excluded
            (24, 8, TS(2024, 1, 1, 10, 5, 0), 0.0),   # other user -> excluded
        ],
    )
    got = {
        r["_r"]["event_id"]
        for r in range_join(views, purchases, "user_id", "ts", "ts", 600).collect()
    }
    assert got == {21, 22}
