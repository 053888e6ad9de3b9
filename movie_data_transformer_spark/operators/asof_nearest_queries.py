"""Nearest-direction as-of join — pandas merge_asof(direction='nearest')
as a distributed operator. The shipped as-of surfaces are BACKWARD
(asof_view_before_purchase, cogroup_asof_match, scd2_point_in_time_join);
nearest is the variant attribution pipelines want ("which view is this
purchase closest to in time, before OR after?") and Spark has no native
ASOF JOIN, so it is built from the single-pass merge trick:

  union views+purchases into one per-user stream ordered by (ts_us,
  event_id); forward-fill the last view (window UNBOUNDED PRECEDING,
  ignoreNulls last) and backward-fill the next view (window UNBOUNDED
  FOLLOWING, ignoreNulls first); each purchase then picks whichever
  candidate is nearer within the tolerance.

NO view-x-purchase join ever forms: cost is one user-keyed shuffle and
two window passes over the SAME partitioning — the classic
sort-merge-asof shape, skew class = per-user activity.

Tie rules (pinned in pytest): |dt| equal -> the BACKWARD (earlier) view
wins, matching merge_asof's documented nearest tie-break toward the
left/backward side; a view AT the purchase timestamp is backward with
dt = 0. Tolerance: 10 minutes; purchases with no view in range emit
matched_view_id NULL (kept — the attribution report needs the misses).

Entry `asof_nearest_view_purchase` (FULL DuckDB oracle): per purchase —
event_id, user_id, matched_view_id, dt_us (signed: negative = view
before purchase), direction ('backward' / 'forward' / 'none'). Exact
integer micros end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_transformer_spark.sources.tables import load_table

TOL_US = 600_000_000  # 10 minutes


def q_asof_nearest_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type IN ('view', 'purchase')"
    ).selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
    )
    stream = ev.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        "IF(event_type = 'view', named_struct('ts_us', ts_us,"
        " 'event_id', event_id), NULL) AS v",
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = stream.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
    )
    purchases = filled.filter("event_type = 'purchase'")
    return purchases.selectExpr(
        "event_id",
        "user_id",
        "IF(pv IS NOT NULL AND ts_us - pv.ts_us <= " + str(TOL_US) + ","
        " pv, NULL) AS bv",
        "IF(nv IS NOT NULL AND nv.ts_us - ts_us <= " + str(TOL_US) + ","
        " nv, NULL) AS fv",
        "ts_us",
    ).selectExpr(
        "event_id",
        "user_id",
        # nearer candidate; tie -> backward
        "CASE"
        " WHEN bv IS NULL AND fv IS NULL THEN NULL"
        " WHEN fv IS NULL THEN bv"
        " WHEN bv IS NULL THEN fv"
        " WHEN (ts_us - bv.ts_us) <= (fv.ts_us - ts_us) THEN bv"
        " ELSE fv END AS m",
        "ts_us",
    ).selectExpr(
        "event_id",
        "user_id",
        "m.event_id AS matched_view_id",
        "CASE WHEN m IS NULL THEN NULL ELSE m.ts_us - ts_us END AS dt_us",
        "CASE WHEN m IS NULL THEN 'none'"
        " WHEN m.ts_us <= ts_us THEN 'backward' ELSE 'forward'"
        " END AS direction",
    )


SQL_ASOF_NEAREST_VIEW_PURCHASE = f"""
WITH ev AS (
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           CASE WHEN event_type = 'view' THEN
                {{'ts_us': epoch_us(CAST(ts AS TIMESTAMP)),
                  'event_id': event_id}} END AS v
    FROM events WHERE event_type IN ('view', 'purchase')
),
filled AS (
    SELECT user_id, event_id, event_type, ts_us,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS pv,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
    FROM ev
),
cand AS (
    SELECT event_id, user_id, ts_us,
           CASE WHEN pv IS NOT NULL AND ts_us - pv.ts_us <= {TOL_US}
                THEN pv END AS bv,
           CASE WHEN nv IS NOT NULL AND nv.ts_us - ts_us <= {TOL_US}
                THEN nv END AS fv
    FROM filled WHERE event_type = 'purchase'
),
picked AS (
    SELECT event_id, user_id, ts_us,
           CASE
             WHEN bv IS NULL AND fv IS NULL THEN NULL
             WHEN fv IS NULL THEN bv
             WHEN bv IS NULL THEN fv
             WHEN (ts_us - bv.ts_us) <= (fv.ts_us - ts_us) THEN bv
             ELSE fv END AS m
    FROM cand
)
SELECT event_id, user_id,
       m.event_id AS matched_view_id,
       CASE WHEN m IS NULL THEN NULL ELSE m.ts_us - ts_us END AS dt_us,
       CASE WHEN m IS NULL THEN 'none'
            WHEN m.ts_us <= ts_us THEN 'backward' ELSE 'forward'
       END AS direction
FROM picked
"""


QUERIES = {
    "asof_nearest_view_purchase": (
        q_asof_nearest_view_purchase,
        SQL_ASOF_NEAREST_VIEW_PURCHASE,
    ),
}
