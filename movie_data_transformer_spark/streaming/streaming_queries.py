"""Registry entries for event-time windowing (M4) — batch-replay forms,
oracle-checked via epoch-bucket arithmetic in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table
from movie_data_transformer_spark.streaming.windows import (
    dedup_events,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


SQL_STREAM_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"), "1 hour", "30 minutes")


# each event belongs to the two slide-aligned windows covering it:
# starts floor(t/1800)*1800 and that minus 1800 (width 3600, slide 1800)
SQL_STREAM_SLIDING = """
WITH assigned AS (
    SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS bucket_start, event_type
    FROM events
    UNION ALL
    SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT) AS bucket_start, event_type
    FROM events
)
SELECT bucket_start, event_type, count(*) AS n_events
FROM assigned GROUP BY 1, 2
"""


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load_table(spark, sf_dir, "events"), "30 minutes")


# gaps-and-islands: a new session starts when the gap to the previous
# event of the same user exceeds 30 min; session_start = min ts in island
SQL_STREAM_SESSION = """
WITH seq AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                     > 1800
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
islands AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM seq
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events
FROM islands GROUP BY user_id, session_id
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_events(load_table(spark, sf_dir, "events"))


SQL_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day
FROM events
"""


QUERIES = {
    "stream_tumbling_window": (q_stream_tumbling, SQL_STREAM_TUMBLING),
    "stream_sliding_window": (q_stream_sliding, SQL_STREAM_SLIDING),
    "stream_session_window": (q_stream_session, SQL_STREAM_SESSION),
    "stream_dedup_keys": (q_stream_dedup, SQL_STREAM_DEDUP),
}
