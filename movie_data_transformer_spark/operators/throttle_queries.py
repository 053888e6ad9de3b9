"""TTL throttling (greedy rate-limit dedup): per (user, event_type),
keep an event only if at least TTL has elapsed since the LAST KEPT one —
the notification-throttle / alert-dedup / "send at most one email per 3
days" semantic. Genuinely sequential per entity: whether an event is
kept depends on the greedy kept-chain before it, so no window frame
expresses it (session windows differ: a session extends on every event
within gap, including suppressed ones; the throttle clock resets only on
KEPT events).

Engine side: the per-entity greedy walk as a grouped applyInPandas fold
(Arrow-batched; this is exactly the per-entity-ordered-fold case the
repo reserves the pandas path for). Oracle side: DuckDB WITH RECURSIVE
walking every group's kept-pointer in parallel, one LATERAL
first-event-after-deadline probe per step (the emb_kcenter_coreset
recursive-LATERAL technique) — so the sequential semantic is FULLY
oracle-checked, not rows-only.

Timestamps ride as unix micros (integers) end-to-end; ordering ties
break on event_id — a total order both engines share.

Scale: one shuffle on (user, event_type); each group's walk is O(its
own events) inside one Arrow batch; kept-chain state never leaves the
group. The recursion depth of the ORACLE (~observation window / TTL) is
an oracle-side cost only — the engine is single-pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

TTL_US = 3 * 86_400 * 1_000_000  # 3 days


def throttle_ttl(ev: DataFrame, ttl_us: int = TTL_US) -> DataFrame:
    """ev: (user_id, event_type, ts_us, event_id) -> kept rows."""

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        out = {"user_id": [], "event_type": [], "kept_ts_us": [], "kept_event_id": []}
        last = None
        for r in pdf.itertuples(index=False):
            if last is None or r.ts_us >= last + ttl_us:
                out["user_id"].append(r.user_id)
                out["event_type"].append(r.event_type)
                out["kept_ts_us"].append(r.ts_us)
                out["kept_event_id"].append(r.event_id)
                last = r.ts_us
        return pd.DataFrame(out)

    return ev.groupBy("user_id", "event_type").applyInPandas(
        walk,
        "user_id long, event_type string, kept_ts_us long, kept_event_id long",
    )


def q_events_throttle_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_id",
    )
    return throttle_ttl(ev)


SQL_EVENTS_THROTTLE_TTL = f"""
WITH RECURSIVE ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
walk AS (
    SELECT user_id, event_type, ts_us AS kept_ts_us, event_id AS kept_event_id
    FROM (SELECT user_id, event_type, ts_us, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts_us, event_id) AS rn
          FROM ev)
    WHERE rn = 1
  UNION ALL
    SELECT w.user_id, w.event_type, nx.ts_us, nx.event_id
    FROM walk w, LATERAL (
        SELECT e.ts_us, e.event_id FROM ev e
        WHERE e.user_id = w.user_id AND e.event_type = w.event_type
          AND e.ts_us >= w.kept_ts_us + {TTL_US}
        ORDER BY e.ts_us, e.event_id LIMIT 1
    ) nx
)
SELECT user_id, event_type, kept_ts_us, kept_event_id FROM walk
"""


QUERIES = {
    "events_throttle_ttl": (q_events_throttle_ttl, SQL_EVENTS_THROTTLE_TTL),
}
