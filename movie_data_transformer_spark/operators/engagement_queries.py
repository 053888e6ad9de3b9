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


QUERIES = {
    "user_activity_streaks": (q_user_activity_streaks, SQL_USER_ACTIVITY_STREAKS),
    "events_dau_wau_mau": (q_events_dau_wau_mau, SQL_EVENTS_DAU_WAU_MAU),
}
