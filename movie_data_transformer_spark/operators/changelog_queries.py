"""Tombstone-aware CDC changelog apply — the missing piece of the repo's
CDC story (dedup_cdc_chunks does content chunking; merge.py does LWW
upserts): applying an ordered Insert/Update/DELETE feed to keyed state,
where a trailing delete must ERASE the key, not just lose a tiebreak.
This is Debezium/Delta CDF semantics: per key, ops apply in feed order
and the final state is the last op's value — or nothing, if the last op
is a tombstone.

Changelog fixture: events as the feed — purchase = upsert (value in
cents), error = tombstone, other types are no-ops; op order per key is
(ts, event_id), a total order both engines share. Output = surviving
keys only, with the applied value, the op sequence number, and how many
ops the key saw (the audit columns a CDC sink reports). FULL oracle.

Scale: last-op-wins is ONE max_by-style hash aggregation on the key —
no window sort needed (the same sort-free LWW form as
movies_dedup_latest_maxby, here with tombstone filtering after the
fold). At 100 TB this is a single shuffle on key with map-side partial
max_by; the changelog never needs to be ordered globally, only the
per-key argmax survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "CASE WHEN event_type = 'purchase' THEN 'U'"
        "     WHEN event_type = 'error' THEN 'D' END AS op",
        "CAST(floor(value * 100) AS BIGINT) AS cents",
        "ts",
        "event_id",
    ).filter("op IS NOT NULL")
    folded = ops.groupBy("user_id").agg(
        F.expr("max_by(op, struct(ts, event_id))").alias("last_op"),
        F.expr("max_by(cents, struct(ts, event_id))").alias("last_cents"),
        F.expr("max_by(event_id, struct(ts, event_id))").alias("last_op_seq"),
        F.count("*").cast("long").alias("n_ops"),
    )
    return folded.filter("last_op = 'U'").select(
        "user_id", "last_cents", "last_op_seq", "n_ops"
    )


SQL_CDC_APPLY_TOMBSTONES = """
WITH ops AS (
    SELECT user_id,
           CASE WHEN event_type = 'purchase' THEN 'U'
                WHEN event_type = 'error' THEN 'D' END AS op,
           CAST(floor(value * 100) AS BIGINT) AS cents,
           ts, event_id
    FROM events
    WHERE event_type IN ('purchase', 'error')
),
folded AS (
    -- DuckDB's arg_max can't take a composite ordering key, so the
    -- oracle uses the window LWW form (same semantics as the engine's
    -- sort-free max_by fold)
    SELECT user_id, op AS last_op, cents AS last_cents,
           event_id AS last_op_seq,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ops
)
SELECT user_id, last_cents, last_op_seq, n_ops
FROM folded
WHERE rn = 1 AND last_op = 'U'
"""


QUERIES = {
    "cdc_apply_tombstones": (q_cdc_apply_tombstones, SQL_CDC_APPLY_TOMBSTONES),
}
