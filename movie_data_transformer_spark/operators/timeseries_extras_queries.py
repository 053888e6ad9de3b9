"""Round-6 time-series extension: CUSUM drift detection over the event
stream's daily volume — the standard page-drift / data-quality alarm a
training-data ingest pipeline runs on every source feed.

The textbook CUSUM fold s_i = max(0, s_{i-1} + dev_i) looks inherently
sequential, but it has a closed WINDOW form:

    s_i = prefix_i - least(0, min_{j<=i} prefix_j)

(prefix = running sum of deviations; proof: the running min is exactly
the amount the max(0, .) clamp has discarded). That turns an
unparallelizable recurrence into two ordinary ordered windows — the
difference between a driver loop and a plan that scales.

Exactness: deviations are scaled by n_days (dev_i = n_i * n_days -
total), so no division ever happens; everything is bigint and the entry
carries a FULL DuckDB oracle. The drift flag compares the scaled CUSUM
against `total` (== one day-mean of accumulated excess in these units).

Scale: one data-sized shuffle to day grain; the windows (including the
over-() totals) run on the tiny day-grain table — same small-aggregate
pattern as the TPC-H q11/q15 thresholds. Day keys are integer epoch-days
(Spark unix_timestamp truncation == DuckDB floor(epoch()), NOTES.md
pitfall list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """CUSUM over a (day_idx, n_events) daily table via the window
    identity in the module docstring. Exposed separately so tests can
    drive planted drift series through the PRODUCTION expressions."""
    return daily.selectExpr(
        "day_idx",
        "n_events",
        "n_events * (count(*) OVER ()) - (sum(n_events) OVER ()) AS dev",
        "sum(n_events) OVER () AS total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "sum(dev) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS prefix",
        "total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "prefix",
        "min(prefix) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS runmin",
        "total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "CAST(prefix - least(CAST(0 AS BIGINT), runmin) AS BIGINT)"
        " AS cusum_scaled",
        "CAST(IF(prefix - least(CAST(0 AS BIGINT), runmin) > total, 1, 0)"
        " AS INT) AS is_drift",
    )


def q_events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr("unix_timestamp(ts) DIV 86400 AS day_idx")
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    return cusum_from_daily(daily)


SQL_EVENTS_CUSUM_DRIFT = """
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
),
t AS (
    SELECT day_idx, n_events,
           n_events * CAST(count(*) OVER () AS BIGINT)
               - CAST(sum(n_events) OVER () AS BIGINT) AS dev,
           CAST(sum(n_events) OVER () AS BIGINT) AS total
    FROM daily
),
w1 AS (
    SELECT day_idx, n_events, total,
           CAST(sum(dev) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix
    FROM t
),
w AS (
    SELECT day_idx, n_events, total, prefix,
           CAST(min(prefix) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS runmin
    FROM w1
)
SELECT day_idx, n_events,
       CAST(prefix - least(CAST(0 AS BIGINT), runmin) AS BIGINT)
           AS cusum_scaled,
       CAST(CASE WHEN prefix - least(CAST(0 AS BIGINT), runmin) > total
                 THEN 1 ELSE 0 END AS INT) AS is_drift
FROM w
"""


QUERIES = {
    "events_cusum_drift": (q_events_cusum_drift, SQL_EVENTS_CUSUM_DRIFT),
}
