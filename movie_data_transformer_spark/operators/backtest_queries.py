"""Rolling-origin forecast backtesting — the evaluation half of the
repo's forecasting family (events_holt_linear / holt_winters produce
forecasts; this entry measures forecast QUALITY the way practitioners
do: walk the origin forward one day at a time and score each method's
one-step-ahead error on data it hasn't seen).

`forecast_backtest_daily` (FULL oracle): daily event counts over Jan
2024; for every target day with a full history window, two standard
baselines forecast it — naive (the previous observed day's count) and
seasonal-naive (7 observed days back). The fixture has an event every
calendar day at all SFs, so observed-day lags equal calendar lags; a
gappy series would first run through events_resample_interpolate (the
composition is the point of having both). Per method: evaluated days, total absolute
error, MAE in milli-units, and MASE in micro-units (the method's error
relative to the naive baseline's — the scale-free skill score Hyndman &
Koehler 2006 recommend; naive's own MASE is exactly 1e6 by
construction, a built-in sanity anchor the oracle binds).

All integer arithmetic: counts are integers, errors are |int - int|,
ratios in milli/micro units by truncating division.

Scale: the backtest runs on the RESAMPLED daily grain (one lag/lead
window over n_days rows after the pre-agg collapses event volume), so
cost is independent of event count — same shape as
events_resample_interpolate. Per-series backtests partition the windows
by series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table


def q_forecast_backtest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(ev.ts.cast("date").alias("day")).count()
    walled = daily.selectExpr(
        "day",
        "count AS actual",
        "lag(count, 1) OVER (ORDER BY day) AS f_naive",
        "lag(count, 7) OVER (ORDER BY day) AS f_snaive",
    ).filter("f_naive IS NOT NULL AND f_snaive IS NOT NULL")
    errs = walled.selectExpr(
        "abs(actual - f_naive) AS e_naive",
        "abs(actual - f_snaive) AS e_snaive",
    )
    return errs.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_days",
        "CAST(sum(e_naive) AS BIGINT) AS abs_err_naive",
        "CAST(sum(e_snaive) AS BIGINT) AS abs_err_snaive",
    ).selectExpr(
        "n_days",
        "abs_err_naive",
        "abs_err_snaive",
        "CAST(abs_err_naive * 1000 div n_days AS BIGINT) AS mae_naive_milli",
        "CAST(abs_err_snaive * 1000 div n_days AS BIGINT) AS mae_snaive_milli",
        "CAST(abs_err_snaive * 1000000 div abs_err_naive AS BIGINT)"
        " AS mase_snaive_micro",
    )


SQL_FORECAST_BACKTEST_DAILY = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS actual
    FROM events GROUP BY 1
),
walled AS (
    SELECT day, actual,
           lag(actual, 1) OVER (ORDER BY day) AS f_naive,
           lag(actual, 7) OVER (ORDER BY day) AS f_snaive
    FROM daily
),
errs AS (
    SELECT abs(actual - f_naive) AS e_naive,
           abs(actual - f_snaive) AS e_snaive
    FROM walled
    WHERE f_naive IS NOT NULL AND f_snaive IS NOT NULL
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(e_naive) AS BIGINT) AS abs_err_naive,
           CAST(sum(e_snaive) AS BIGINT) AS abs_err_snaive
    FROM errs
)
SELECT n_days, abs_err_naive, abs_err_snaive,
       CAST(abs_err_naive * 1000 // n_days AS BIGINT) AS mae_naive_milli,
       CAST(abs_err_snaive * 1000 // n_days AS BIGINT) AS mae_snaive_milli,
       CAST(abs_err_snaive * 1000000 // abs_err_naive AS BIGINT)
           AS mase_snaive_micro
FROM tot
"""


QUERIES = {
    "forecast_backtest_daily": (
        q_forecast_backtest_daily,
        SQL_FORECAST_BACKTEST_DAILY,
    ),
}
