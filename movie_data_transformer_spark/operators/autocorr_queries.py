"""Autocorrelation of the daily event-count series, per event_type, at
lags 1 and 7 — PER EVENT TYPE, the series-by-series companion of
events_daily_acf (timeseries_extras_queries.py), which measures the
mean-centered ACF of the single TOTAL daily series at lags 1..7. The
two answer different questions: daily_acf says "does the whole corpus
have weekly seasonality"; this entry says "WHICH event stream is
sticky/seasonal" (pairwise-complete Pearson per type) — the report a
forecasting pipeline (forecast_backtest_daily, events_holt_linear)
uses to pick per-stream models.

Construction (exact where it can be): daily counts are INTEGERS, so all
Pearson sufficient statistics over the lag-k pair set (n, Sx, Sy, Sxy,
Sxx, Syy) are exact bigints. Only the final normalization touches
doubles:

    corr_micro = floor( (n*Sxy - Sx*Sy) * 1e6
                        / sqrt( (n*Sxx - Sx^2) * (n*Syy - Sy^2) ) )

with the variance product multiplied in DOUBLE (each factor is an exact
bigint < 2^53 at any plausible daily-count scale, so the double product
and one sqrt are the identical IEEE computation in both engines — the
dsir_queries libm note). Pairs exist only where BOTH day d and day d+k
have events (inner join on the calendar date; the fixture is dense).

Entry `events_autocorr_daily` (FULL DuckDB oracle): per (event_type,
lag in {1, 7}) — n_pairs, cov_num (the exact bigint numerator), and
corr_micro (NULL when a variance is zero).

Scale: daily aggregation is map-side-combinable into (type, day) —
tiny domain; the lag join is a self-join of that small aggregate, and
both sides arrive already partitioned by the same agg shuffle. At
100 TB the fact scan dominates; everything after the first groupBy is
dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

LAGS = (1, 7)


def q_events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    lags = spark.range(1).selectExpr(
        f"explode(array({', '.join(str(k) for k in LAGS)})) AS lag"
    )
    left = daily.crossJoin(F.broadcast(lags))
    right = daily.selectExpr(
        "event_type", "d AS d2", "c AS c2"
    )
    pairs = left.join(
        right,
        (left.event_type == right.event_type)
        & (F.expr("date_add(d, lag)") == right.d2),
    ).select(left.event_type, "lag", "c", "c2")
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum("c2").cast("bigint").alias("sy"),
        F.sum(F.expr("c * c2")).cast("bigint").alias("sxy"),
        F.sum(F.expr("c * c")).cast("bigint").alias("sxx"),
        F.sum(F.expr("c2 * c2")).cast("bigint").alias("syy"),
    )
    return stats.selectExpr(
        "event_type",
        "CAST(lag AS BIGINT) AS lag",
        "n_pairs",
        "n_pairs * sxy - sx * sy AS cov_num",
        "CASE WHEN n_pairs * sxx - sx * sx = 0"
        " OR n_pairs * syy - sy * sy = 0 THEN NULL ELSE"
        " CAST(floor((n_pairs * sxy - sx * sy) * 1000000 /"
        " sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *"
        " CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS BIGINT)"
        " END AS corr_micro",
    )


SQL_EVENTS_AUTOCORR_DAILY = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
lags AS (SELECT unnest([{', '.join(str(k) for k in LAGS)}]) AS lag),
pairs AS (
    SELECT a.event_type, l.lag, a.c, b.c AS c2
    FROM daily a CROSS JOIN lags l
    JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.lag
),
stats AS (
    SELECT event_type, lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(c) AS BIGINT) AS sx,
           CAST(sum(c2) AS BIGINT) AS sy,
           CAST(sum(c * c2) AS BIGINT) AS sxy,
           CAST(sum(c * c) AS BIGINT) AS sxx,
           CAST(sum(c2 * c2) AS BIGINT) AS syy
    FROM pairs GROUP BY 1, 2
)
SELECT event_type,
       CAST(lag AS BIGINT) AS lag,
       n_pairs,
       n_pairs * sxy - sx * sy AS cov_num,
       CASE WHEN n_pairs * sxx - sx * sx = 0
                 OR n_pairs * syy - sy * sy = 0 THEN NULL ELSE
            CAST(floor((n_pairs * sxy - sx * sy) * 1000000 /
                 sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
                      CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS BIGINT)
       END AS corr_micro
FROM stats
"""


QUERIES = {
    "events_autocorr_daily": (
        q_events_autocorr_daily,
        SQL_EVENTS_AUTOCORR_DAILY,
    ),
}
