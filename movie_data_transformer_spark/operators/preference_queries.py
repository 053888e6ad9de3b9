"""Preference-pair construction — the data-prep step for
RLHF/DPO-style training: per user, emit one (chosen, rejected) pair of
purchase events, chosen = the highest-valued purchase, rejected = the
lowest (deterministic tie-break by event_id ASC on both ends), with the
preference margin. Downstream consumers: reward-model training batches,
or the recsys eval family already shipped.

Money discipline: `value` is a 2-decimal double, so it is converted to
exact integer CENTS up front (floor(value*100 + 0.5) — identical in
both engines on halves because .005 doubles are not exact and the
fixture's two-decimal values round identically); every comparison and
margin after that is exact bigint.

Entry `pref_pairs_build` (FULL DuckDB oracle): per user with >= 2
purchase events — user_id, chosen_event_id, rejected_event_id,
chosen_cents, rejected_cents, margin_cents. Users whose purchases all
tie still emit a pair with margin 0 (chosen/rejected then differ only
by event_id ordering — documented, pinned in pytest).

Scale: filter pushes to the parquet scan (PushedFilters on
event_type); ONE shuffle on user_id feeds both rank windows (same
partition spec); WindowGroupLimit prunes to rank 1 map-side. Output is
one row per user — bounded by the user dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_transformer_spark.sources.tables import load_table

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def q_pref_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id", "event_id", f"{_CENTS} AS cents"
    )
    w_hi = Window.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    w_lo = Window.partitionBy("user_id").orderBy(
        F.col("cents").asc(), F.col("event_id")
    )
    ranked = purchases.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number().over(w_hi).alias("rn_hi"),
        F.row_number().over(w_lo).alias("rn_lo"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    ).filter("n >= 2")
    hi = ranked.filter("rn_hi = 1").selectExpr(
        "user_id",
        "event_id AS chosen_event_id",
        "cents AS chosen_cents",
    )
    lo = ranked.filter("rn_lo = 1").selectExpr(
        "user_id",
        "event_id AS rejected_event_id",
        "cents AS rejected_cents",
    )
    return hi.join(lo, "user_id").selectExpr(
        "user_id",
        "chosen_event_id",
        "rejected_event_id",
        "chosen_cents",
        "rejected_cents",
        "chosen_cents - rejected_cents AS margin_cents",
    )


SQL_PREF_PAIRS_BUILD = f"""
WITH purchases AS (
    SELECT user_id, event_id, {_CENTS} AS cents
    FROM events WHERE event_type = 'purchase'
),
ranked AS (
    SELECT user_id, event_id, cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cents DESC, event_id) AS rn_hi,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cents ASC, event_id) AS rn_lo,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM purchases
),
eligible AS (SELECT * FROM ranked WHERE n >= 2)
SELECT h.user_id,
       h.event_id AS chosen_event_id,
       l.event_id AS rejected_event_id,
       h.cents AS chosen_cents,
       l.cents AS rejected_cents,
       h.cents - l.cents AS margin_cents
FROM (SELECT * FROM eligible WHERE rn_hi = 1) h
JOIN (SELECT * FROM eligible WHERE rn_lo = 1) l ON l.user_id = h.user_id
"""


QUERIES = {
    "pref_pairs_build": (q_pref_pairs_build, SQL_PREF_PAIRS_BUILD),
}
