"""Threshold alerting with HYSTERESIS — the monitoring-system semantic
(alert turns ON above the high watermark, OFF only below the low one;
the dead band between them suppresses flapping). Looks like a sequential
state machine, but the state is fully determined by the LAST DECISIVE
observation: classify each day hi/lo/neutral, then the alert state is
the last non-neutral classification — one `last(..., ignorenulls)`
window, the gaps-and-islands forward-fill. A second lag turns states
into TRANSITIONS (alert_started / alert_ended), the rows an alerting
pipeline actually emits.

`events_hysteresis_alerts` (FULL oracle): daily event counts vs
ORDER-STATISTIC watermarks (hi = the p80 daily count, lo = p40, exact
rank picks) — relative-to-mean bands close up as volume grows (day
noise shrinks ~1/sqrt(n)), while quantile bands guarantee decisive days
at EVERY scale; transitions only.

Scale: one daily pre-agg + two windows over the n_days grain (the
events_resample_interpolate discipline — window cost is independent of
event volume); per-series alerting partitions the windows by series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_events_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(ev.ts.cast("date").alias("day")).count()
    ranked = daily.selectExpr(
        "day",
        "count AS n",
        "row_number() OVER (ORDER BY count, day) AS rk",
        "count(*) OVER () AS n_days",
    )
    cuts = ranked.selectExpr(
        "max(CASE WHEN rk = (n_days * 8 + 9) div 10 THEN n END) AS hi",
        "max(CASE WHEN rk = (n_days * 4 + 9) div 10 THEN n END) AS lo",
    )
    classified = ranked.crossJoin(F.broadcast(cuts)).selectExpr(
        "day",
        "n",
        "CASE WHEN n > hi THEN 'on' WHEN n < lo THEN 'off' END AS decisive",
    )
    stated = classified.selectExpr(
        "day",
        "n",
        "coalesce(last(decisive, true) OVER (ORDER BY day"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'off') AS state",
    )
    return stated.selectExpr(
        "day",
        "n",
        "state",
        "lag(state, 1, 'off') OVER (ORDER BY day) AS prev_state",
    ).filter("state != prev_state").selectExpr(
        "day",
        "CAST(n AS BIGINT) AS n",
        "CASE WHEN state = 'on' THEN 'alert_started'"
        " ELSE 'alert_ended' END AS transition",
    )


SQL_EVENTS_HYSTERESIS_ALERTS = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1
),
ranked AS (
    SELECT day, n,
           row_number() OVER (ORDER BY n, day) AS rk,
           count(*) OVER () AS n_days
    FROM daily
),
cuts AS (
    SELECT max(CASE WHEN rk = (n_days * 8 + 9) // 10 THEN n END) AS hi,
           max(CASE WHEN rk = (n_days * 4 + 9) // 10 THEN n END) AS lo
    FROM ranked
),
classified AS (
    SELECT day, n,
           CASE WHEN n > hi THEN 'on' WHEN n < lo THEN 'off' END AS decisive
    FROM ranked, cuts
),
stated AS (
    SELECT day, n,
           coalesce(last_value(decisive IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'off')
               AS state
    FROM classified
)
SELECT day, CAST(n AS BIGINT) AS n,
       CASE WHEN state = 'on' THEN 'alert_started'
            ELSE 'alert_ended' END AS transition
FROM (SELECT day, n, state,
             lag(state, 1, 'off') OVER (ORDER BY day) AS prev_state
      FROM stated)
WHERE state != prev_state
"""


QUERIES = {
    "events_hysteresis_alerts": (
        q_events_hysteresis_alerts,
        SQL_EVENTS_HYSTERESIS_ALERTS,
    ),
}
