"""Engine facade (SQL surface) + grouped-pandas operator tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movie_data_transformer_spark.engine import MovieEngine
from movie_data_transformer_spark.operators.grouped_pandas import user_value_trend


def test_engine_sql_surface(spark, sf_dir):
    eng = MovieEngine.connect(sf_dir, spark)
    row = eng.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer GROUP BY 1 ORDER BY n DESC, c_mktsegment LIMIT 1
        """
    ).collect()[0]
    assert row.n > 0 and row.c_mktsegment
    assert eng.table("region").count() == 5
    cat = eng.queries()
    assert "movies_kv" in cat and cat["movies_kv"]().count() > 0


def test_user_value_trend_matches_numpy(spark, sf_dir):
    from movie_data_transformer_spark.sources.tables import load_events_raw_ns

    raw = load_events_raw_ns(spark, sf_dir)
    got = {r.user_id: r for r in user_value_trend(raw).collect()}
    pdf = raw.select("user_id", "ts", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        # numpy reference on FLOOR-SECOND x (the operator's exact-integer
        # domain; sub-second jitter would otherwise shift the slope by
        # ~1s over a month-long span)
        t = ((g["ts"].astype("int64") // 1_000_000_000) / 86400.0).to_numpy()
        v = g["value"].to_numpy()
        tc, vc = t - t.mean(), v - v.mean()
        want = float((tc * vc).sum() / (tc * tc).sum())
        tol = max(1e-6, 1e-6 * abs(want))
        assert abs(got[uid].slope_per_day - want) < tol
        assert got[uid].n == len(g)
        assert abs(got[uid].mean_value - round(float(v.mean()), 2)) < 0.005
