"""Time-series resampling with linear-interpolation gap fill — the
repair step between raw event feeds and any downstream model that wants
a dense regular grid (forecasting, anomaly bands, joins against other
daily series). function_packs.date_spine_gap_fill zero-fills; this is
the INTERPOLATING resample (pandas `.interpolate()` / timescale
`locf+interpolate`), distributed.

Fixture realism: days where day-of-month % 4 == 1 are treated as a
sensor outage and EXCLUDED from the observed series (planted gaps — the
repo's planted-truth pattern), so interpolation does real, verified
work at every SF (data-driven gaps would close as SF grows). Outage
days are reconstructed as
  prev + (next - prev) * (day - prev_day) div (next_day - prev_day)
in exact integer cents over epoch-day arithmetic; leading/trailing gaps
fall back to bfill/ffill. FULL oracle (same window algebra in DuckDB:
last_value/first_value IGNORE NULLS over the day order).

Scale: the interpolation windows run on the RESAMPLED grain (one row
per day), i.e. after the daily pre-aggregation has already collapsed
the event volume — the unbounded-frame windows touch n_days rows, not
n_events. Per-series resampling partitions by series key; this entry's
single global series is the 1-partition special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    observed = (
        ev.filter("event_type = 'purchase' AND day(ts) % 4 != 1")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)")).alias("cents"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    grid = spine.join(observed, "day", "left")
    walled = grid.selectExpr(
        "day",
        "cents",
        "last(cents, true) OVER (ORDER BY day"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c",
        "last(CASE WHEN cents IS NOT NULL THEN day END, true) OVER (ORDER BY day"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d",
        "first(cents, true) OVER (ORDER BY day"
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c",
        "first(CASE WHEN cents IS NOT NULL THEN day END, true) OVER (ORDER BY day"
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d",
    )
    return walled.selectExpr(
        "day",
        "CAST(CASE"
        " WHEN cents IS NOT NULL THEN cents"
        " WHEN prev_c IS NULL THEN next_c"
        " WHEN next_c IS NULL THEN prev_c"
        " ELSE prev_c + (next_c - prev_c) * datediff(day, prev_d)"
        "      div datediff(next_d, prev_d) END AS BIGINT) AS filled_cents",
        "CAST(cents IS NULL AS BOOLEAN) AS is_interpolated",
    )


SQL_EVENTS_RESAMPLE_INTERPOLATE = """
WITH observed AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE event_type = 'purchase' AND day(ts) % 4 != 1
    GROUP BY 1
),
spine AS (
    SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                       INTERVAL 1 DAY)) AS DATE) AS day
),
grid AS (
    SELECT spine.day, observed.cents
    FROM spine LEFT JOIN observed ON spine.day = observed.day
),
walled AS (
    SELECT day, cents,
           last_value(cents IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
           last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
           first_value(cents IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
           first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
    FROM grid
)
SELECT day,
       CAST(CASE
            WHEN cents IS NOT NULL THEN cents
            WHEN prev_c IS NULL THEN next_c
            WHEN next_c IS NULL THEN prev_c
            ELSE prev_c + (next_c - prev_c) * date_diff('day', prev_d, day)
                 // date_diff('day', prev_d, next_d) END AS BIGINT)
           AS filled_cents,
       CAST(cents IS NULL AS BOOLEAN) AS is_interpolated
FROM walled
"""


QUERIES = {
    "events_resample_interpolate": (
        q_events_resample_interpolate,
        SQL_EVENTS_RESAMPLE_INTERPOLATE,
    ),
}
