"""Order-respecting FIFO event matching — the sequential "consume prior
supply" primitive behind conversion attribution (match each purchase to
a distinct EARLIER view), inventory fulfillment (fill orders from prior
stock), and CEP's AFTER MATCH SKIP PAST LAST ROW counting. The greedy
scan looks irreducibly sequential, but the matched count has a closed
form over prefix sums (the balanced-parentheses identity):

  matched(user) = n_purchase - max(0, max over prefixes of
                                       (purchases_so_far - views_so_far))

— every purchase is an unmatched "closer" exactly when the running
deficit reaches a new maximum, so one running-sum window + one agg
computes the greedy matching EXACTLY, no iteration, no UDF. Total order
within user is (ts, event_id), so both engines scan identically. FULL
oracle.

Scale: one shuffle on user_id; the running sum is a within-partition
window over the user's own events (granular keys, no global sort) and
the result is one row per user. This is the textbook example of turning
a "sequential" per-entity scan into a window — the same shape scales to
any per-entity-ordered fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_events_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type IN ('view', 'purchase')"
    )
    running = ev.selectExpr(
        "user_id",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p",
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)"
        " OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS deficit",
    )
    return running.groupBy("user_id").agg(
        F.sum(F.expr("1 - is_p")).cast("long").alias("n_views"),
        F.sum("is_p").cast("long").alias("n_purchases"),
        F.expr(
            "CAST(sum(is_p) - greatest(CAST(0 AS BIGINT), max(deficit)) AS BIGINT)"
        ).alias("n_matched"),
    )


SQL_EVENTS_FIFO_MATCH = """
WITH running AS (
    SELECT user_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS deficit
    FROM events
    WHERE event_type IN ('view', 'purchase')
)
SELECT user_id,
       CAST(sum(1 - is_p) AS BIGINT) AS n_views,
       CAST(sum(is_p) AS BIGINT) AS n_purchases,
       CAST(sum(is_p) - greatest(CAST(0 AS BIGINT), max(deficit)) AS BIGINT)
           AS n_matched
FROM running
GROUP BY user_id
"""


QUERIES = {
    "events_fifo_match": (q_events_fifo_match, SQL_EVENTS_FIFO_MATCH),
}
