"""Snapshot version DIFF — what you actually DO with time travel:
compare two committed versions of the keyed state and classify every
key as added / changed / unchanged (plus removed, structurally absent
under additive merge — the zero row is part of the contract). The
backfill-validation / "what did last night's merge touch" report every
lakehouse team runs against Delta/Iceberg history; here against the
repo's own COW snapshot store (sinks/snapshot.py), reusing the exact
two-version fixture table_time_travel builds.

Exactness: totals are read back as DECIMAL(18,4) and compared in e4
integer units (CAST(total * 10000 AS BIGINT)) — no float equality
anywhere. FULL oracle: both versions re-derived from events (the
time-travel oracle's derivation), diffed in SQL.

Scale: the diff is ONE full-outer join on the state key between two
manifest-selected file sets — cost is state size, not history size
(old versions share unchanged bucket files via the manifest, so the
diff reads shared buckets twice only logically; a bucket-id pre-filter
on the manifests would skip byte-identical buckets entirely, the
metadata shortcut noted in sinks/snapshot.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sinks.snapshot import SnapshotTable


def q_table_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from movie_data_transformer_spark.operators.snapshot_queries import (
        _snapshot_store_dir,
    )

    st = SnapshotTable(spark, _snapshot_store_dir(spark, sf_dir), n_buckets=8)
    v1 = st.read(1).selectExpr(
        "user_id",
        "CAST(total * 10000 AS BIGINT) AS total_e4_v1",
        "CAST(n AS BIGINT) AS n_v1",
    )
    v2 = st.read(2).selectExpr(
        "user_id",
        "CAST(total * 10000 AS BIGINT) AS total_e4_v2",
        "CAST(n AS BIGINT) AS n_v2",
    )
    classified = v1.join(v2, "user_id", "full_outer").selectExpr(
        "user_id",
        "CASE WHEN total_e4_v1 IS NULL THEN 'added'"
        "     WHEN total_e4_v2 IS NULL THEN 'removed'"
        "     WHEN total_e4_v1 != total_e4_v2 OR n_v1 != n_v2 THEN 'changed'"
        "     ELSE 'unchanged' END AS status",
        "coalesce(total_e4_v2, 0) - coalesce(total_e4_v1, 0) AS total_e4_delta",
        "coalesce(n_v2, 0) - coalesce(n_v1, 0) AS n_delta",
    )
    statuses = spark.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)], "status string"
    )
    return (
        statuses.join(classified, "status", "left")
        .groupBy("status")
        .agg(
            F.count("user_id").cast("long").alias("n_keys"),
            F.sum(F.coalesce("user_id", F.lit(0))).cast("long").alias("userkey_sum"),
            F.sum(F.coalesce("total_e4_delta", F.lit(0)))
            .cast("long")
            .alias("total_e4_delta_sum"),
            F.sum(F.coalesce("n_delta", F.lit(0))).cast("long").alias("n_delta_sum"),
        )
    )


SQL_TABLE_VERSION_DIFF = """
WITH p AS (
    SELECT user_id, ts,
           CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_e4
    FROM events WHERE event_type = 'purchase'
),
v1 AS (
    SELECT user_id, CAST(sum(v_e4) AS BIGINT) AS total_e4_v1,
           CAST(count(*) AS BIGINT) AS n_v1
    FROM p WHERE ts < TIMESTAMP '2024-01-20' GROUP BY user_id
),
v2 AS (
    SELECT user_id, CAST(sum(v_e4) AS BIGINT) AS total_e4_v2,
           CAST(count(*) AS BIGINT) AS n_v2
    FROM p WHERE ts < TIMESTAMP '2024-02-01' GROUP BY user_id
),
classified AS (
    SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'added'
                WHEN v2.user_id IS NULL THEN 'removed'
                WHEN total_e4_v1 != total_e4_v2 OR n_v1 != n_v2 THEN 'changed'
                ELSE 'unchanged' END AS status,
           coalesce(total_e4_v2, 0) - coalesce(total_e4_v1, 0) AS total_e4_delta,
           coalesce(n_v2, 0) - coalesce(n_v1, 0) AS n_delta
    FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
),
statuses(status) AS (VALUES ('added'), ('removed'), ('changed'), ('unchanged'))
SELECT s.status,
       CAST(count(c.user_id) AS BIGINT) AS n_keys,
       CAST(sum(coalesce(c.user_id, 0)) AS BIGINT) AS userkey_sum,
       CAST(sum(coalesce(c.total_e4_delta, 0)) AS BIGINT) AS total_e4_delta_sum,
       CAST(sum(coalesce(c.n_delta, 0)) AS BIGINT) AS n_delta_sum
FROM statuses s LEFT JOIN classified c USING (status)
GROUP BY s.status
"""


QUERIES = {
    "table_version_diff": (q_table_version_diff, SQL_TABLE_VERSION_DIFF),
}
