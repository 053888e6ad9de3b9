"""Time travel over the versioned snapshot store (sinks/snapshot.py).

`table_time_travel` materializes a keyed aggregate state TWICE through
the store — version 1 from the first 19 days of purchases, version 2 by
an additive copy-on-write merge of the remaining days — then reads BOTH
versions back THROUGH THE MANIFESTS and emits them side by side. The
oracle recomputes each version's state directly from events, so the
hash binds the full write -> manifest -> time-travel-read round trip:
a merge that corrupts untouched buckets, a manifest that drops a
carried-forward directory, or a versioned read that leaks v2 rows into
v1 all break it.

Scale: the v2 commit costs (touched buckets + batch), never table size
— the property that makes MERGE affordable at 100 TB; old versions stay
readable because data files are immutable and manifests only add
references. The COW file-sharing and snapshot-isolation invariants are
pinned at file level in tests/test_snapshot_store.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sinks.snapshot import SnapshotTable
from movie_data_transformer_spark.sources.tables import load_table

_CUT = "2024-01-20"
_END = "2024-02-01"


def _purchase_state(ev: DataFrame, lo: str | None, hi: str) -> DataFrame:
    f = ev.filter(F.col("event_type") == "purchase").filter(
        F.col("ts") < F.lit(hi).cast("timestamp")
    )
    if lo is not None:
        f = f.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
    return f.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
        F.count("*").cast("bigint").alias("n"),
    )


def q_table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="mdt_snapshot_")
    st = SnapshotTable(spark, root, n_buckets=8)
    st.commit_full(_purchase_state(ev, None, _CUT), "user_id", version=1)
    st.merge_additive(
        _purchase_state(ev, _CUT, _END),
        "user_id",
        ["total", "n"],
        from_version=1,
        new_version=2,
    )
    outs = []
    for v in (1, 2):
        outs.append(
            st.read(v).select(
                F.lit(v).cast("int").alias("version"),
                "user_id",
                F.col("total").cast("double").alias("total"),
                F.col("n").cast("bigint").alias("n"),
            )
        )
    return outs[0].unionByName(outs[1])


SQL_TABLE_TIME_TRAVEL = f"""
WITH p AS (
    SELECT user_id, ts, CAST(value AS DECIMAL(18,4)) AS v
    FROM events WHERE event_type = 'purchase'
),
v1 AS (
    SELECT 1 AS version, user_id,
           CAST(sum(v) AS DOUBLE) AS total, CAST(count(*) AS BIGINT) AS n
    FROM p WHERE ts < TIMESTAMP '{_CUT}' GROUP BY user_id
),
v2 AS (
    SELECT 2 AS version, user_id,
           CAST(sum(v) AS DOUBLE) AS total, CAST(count(*) AS BIGINT) AS n
    FROM p WHERE ts < TIMESTAMP '{_END}' GROUP BY user_id
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2
"""


QUERIES = {
    "table_time_travel": (q_table_time_travel, SQL_TABLE_TIME_TRAVEL),
}
