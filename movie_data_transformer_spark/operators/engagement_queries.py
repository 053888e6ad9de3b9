"""Round-6 engagement metrics: the two iconic activity reports every
behavioral warehouse ships, in exact integers.

- `user_activity_streaks`: each user's LONGEST run of consecutive
  active days — gaps-and-islands on the distinct active-day set
  (day - row_number constant within a streak; the third appearance of
  the islands identity in this engine, after substr runs and RAKE
  phrase segmentation).
- `events_dau_wau_mau`: daily active users plus trailing 7-day and
  30-day distinct-user counts. Rolling DISTINCT does not decompose
  into window partials, so the exact form materializes the day x
  active-user pair table and range-joins each report day to its
  trailing window — exact at day grain, |days| x |daily actives| work.
  At extreme scale the shipped approximate siblings take over
  (agg_bitmap_distinct's per-day OR-merged bitmaps give the same
  numbers EXACTLY for dense user spaces; agg_hll_mergeable for
  sketched); this entry is their exact ground-truth twin.

Both FULL oracle; day keys are integer epoch-days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.selectExpr("user_id", "unix_timestamp(ts) DIV 86400 AS day_idx")
        .distinct()
    )
    return (
        days.selectExpr(
            "user_id",
            "day_idx",
            "day_idx - row_number() OVER (PARTITION BY user_id"
            " ORDER BY day_idx) AS island",
        )
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("streak"))
        .groupBy("user_id")
        .agg(
            F.max("streak").cast("bigint").alias("longest_streak"),
            F.count("*").cast("bigint").alias("n_active_spans"),
            F.sum("streak").cast("bigint").alias("n_active_days"),
        )
    )


SQL_USER_ACTIVITY_STREAKS = """
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
    FROM events
),
isl AS (
    SELECT user_id, day_idx,
           day_idx - row_number() OVER (PARTITION BY user_id
               ORDER BY day_idx) AS island
    FROM days
),
spans AS (
    SELECT user_id, island, count(*) AS streak
    FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(max(streak) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_active_spans,
       CAST(sum(streak) AS BIGINT) AS n_active_days
FROM spans GROUP BY user_id
"""


def q_events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.selectExpr("user_id", "unix_timestamp(ts) DIV 86400 AS day_idx")
        .distinct()
    )
    pairs.createOrReplaceTempView("_eng_pairs")
    return spark.sql(
        """
        WITH report_days AS (SELECT DISTINCT day_idx FROM _eng_pairs)
        SELECT d.day_idx,
               CAST(count(DISTINCT CASE WHEN p.day_idx = d.day_idx
                    THEN p.user_id END) AS BIGINT) AS dau,
               CAST(count(DISTINCT CASE WHEN p.day_idx > d.day_idx - 7
                    THEN p.user_id END) AS BIGINT) AS wau,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS mau
        FROM report_days d
        JOIN _eng_pairs p
          ON p.day_idx BETWEEN d.day_idx - 29 AND d.day_idx
        GROUP BY d.day_idx
        """
    )


SQL_EVENTS_DAU_WAU_MAU = """
WITH pairs AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
    FROM events
),
report_days AS (SELECT DISTINCT day_idx FROM pairs)
SELECT d.day_idx,
       CAST(count(DISTINCT CASE WHEN p.day_idx = d.day_idx
            THEN p.user_id END) AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN p.day_idx > d.day_idx - 7
            THEN p.user_id END) AS BIGINT) AS wau,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS mau
FROM report_days d
JOIN pairs p ON p.day_idx BETWEEN d.day_idx - 29 AND d.day_idx
GROUP BY d.day_idx
"""


def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step conversion funnel (view -> click -> purchase)
    with earliest-completion semantics: a user reaches step k at the
    EARLIEST event of step k's type at-or-after their step k-1 reach
    time. Classic product-analytics funnel; the ordering constraint is
    what plain per-type distinct counts miss.

    Shape: one filtered min-agg per step, each joined to the previous
    step's reach times — three shuffles, all on user_id (co-partitioned
    chain), then a 3-row count table with conversion shares via a
    window-over-() (scalar-subquery-free: the crossJoin form would
    replan the shared subtree, see NOTES.md q11/q15 lesson). At 100 TB
    the per-step aggregates are map-side-combinable min()s on the same
    key — AQE keeps the chain narrow.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        # s1/s2 each feed TWO consumers (the next step's join and the
        # count union) — persist so the events scan behind them runs
        # once (the r6 two-consumer lesson, NOTES.md)
        .persist()
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.selectExpr("1 AS step", "'view' AS step_name", "user_id")
        .unionAll(s2.selectExpr("2 AS step", "'click' AS step_name", "user_id"))
        .unionAll(s3.selectExpr("3 AS step", "'purchase' AS step_name", "user_id"))
        .groupBy("step", "step_name")
        .agg(F.count("*").cast("bigint").alias("users"))
    )
    return counts.selectExpr(
        "step",
        "step_name",
        "users",
        "CAST(users * 1000000 DIV (max(CASE WHEN step = 1 THEN users END)"
        " OVER ()) AS DOUBLE) / 1000000 AS conv_from_first",
    )


SQL_EVENTS_FUNNEL_CONVERSION = """
WITH e AS (SELECT user_id, event_type, ts FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts >= t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts >= t2 GROUP BY e.user_id),
counts AS (
    SELECT 1 AS step, 'view' AS step_name,
           CAST(count(*) AS BIGINT) AS users FROM s1
    UNION ALL
    SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
)
SELECT step, step_name, users,
       CAST(users * 1000000 // (max(CASE WHEN step = 1 THEN users END)
            OVER ()) AS DOUBLE) / 1000000 AS conv_from_first
FROM counts
"""


QUERIES = {
    "user_activity_streaks": (q_user_activity_streaks, SQL_USER_ACTIVITY_STREAKS),
    "events_dau_wau_mau": (q_events_dau_wau_mau, SQL_EVENTS_DAU_WAU_MAU),
    "events_funnel_conversion": (
        q_events_funnel_conversion,
        SQL_EVENTS_FUNNEL_CONVERSION,
    ),
}
