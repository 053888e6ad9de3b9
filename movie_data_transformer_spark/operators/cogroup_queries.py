"""Cogrouped applyInPandas — the last pandas API surface, oracle-bound.

The engine ships five Arrow-batched Python surfaces (pandas UDF, pandas
UDAF, UDTF, grouped/mapInPandas, applyInPandasWithState); the sixth and
final one is the COGROUPED map: `dfA.groupBy(k).cogroup(dfB.groupBy(k))
.applyInPandas(fn, schema)`, where fn receives both groups of one key
as pandas frames. It is the idiomatic hatch for per-key algorithms that
need BOTH sides materialized — classically the as-of merge, which
pandas ships natively as `merge_asof`.

`cogroup_asof_match` runs the purchase<-view as-of match through that
surface and is held to the SAME DuckDB oracle as the expression-form
`asof_view_before_purchase` (temporal_queries.py) — so the claim "the
escape hatch returns exactly what the engine's window form returns" is
hash-checked, tiebreaks included (at equal view timestamps the larger
event_id wins; a view AT the purchase timestamp matches — merge_asof's
allow_exact_matches + last-row-wins on a (ts, event_id)-sorted right
frame reproduces the oracle's last_value ordering).

Scale: one shuffle per side on the cogroup key, then a per-key
O(n log n) pandas sort + linear merge executor-side — no driver
involvement, no per-row Python. The hot path remains the expression
form; this binds the extension surface for operators that genuinely
need two-sided per-key state (custom backtests, bitemporal joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.temporal_queries import (
    SQL_ASOF_VIEW_BEFORE_PURCHASE,
)
from movie_data_transformer_spark.sources.tables import load_table

_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts_s bigint,"
    " view_ts_s bigint, view_value double, view_event_id bigint"
)
_OUT_COLS = ["event_id", "user_id", "ts_s", "view_ts_s", "view_value", "view_event_id"]


def _asof_merge(purchases, views):
    """Per-user as-of merge (runs executor-side inside applyInPandas)."""
    import pandas as pd

    if len(purchases) == 0:
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts_s": pd.Series(dtype="int64"),
                "view_ts_s": pd.Series(dtype="Int64"),
                "view_value": pd.Series(dtype="float64"),
                "view_event_id": pd.Series(dtype="Int64"),
            }
        )
    p = purchases.sort_values(["ts_s", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    if len(views) == 0:
        out = p.copy()
        out["view_ts_s"] = pd.array([pd.NA] * len(p), dtype="Int64")
        out["view_value"] = float("nan")
        out["view_event_id"] = pd.array([pd.NA] * len(p), dtype="Int64")
        return out[_OUT_COLS]
    # sorted by (ts, event_id): merge_asof takes the LAST right row with
    # view_ts_s <= ts_s, so among equal-ts views the max event_id wins —
    # exactly the oracle's last_value(... ORDER BY ts, tag, v_eid).
    v = (
        views.sort_values(["ts_s", "event_id"], kind="mergesort")
        .rename(
            columns={
                "ts_s": "view_ts_s",
                "event_id": "view_event_id",
                "value": "view_value",
            }
        )[["view_ts_s", "view_value", "view_event_id"]]
        .reset_index(drop=True)
    )
    m = pd.merge_asof(
        p,
        v,
        left_on="ts_s",
        right_on="view_ts_s",
        direction="backward",
        allow_exact_matches=True,
    )
    m["view_ts_s"] = m["view_ts_s"].astype("Int64")
    m["view_event_id"] = m["view_event_id"].astype("Int64")
    return m[_OUT_COLS]


def q_cogroup_asof_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase: the user's most recent view at-or-before it —
    computed via cogrouped applyInPandas + pandas.merge_asof."""
    # PITFALL (Spark 4.1, pinned by test_partitioning_invariance): the two
    # cogroup sides MUST come from independent scans. Filtering one shared
    # DataFrame gives both children the same attribute exprIds, and the
    # analyzer cross-binds the right child's function arguments to the left
    # child's attributes (visible in the analyzed plan) — the views pandas
    # frame then arrives mis-assembled once any projection sits on top.
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"))
    )
    views = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value")
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(_asof_merge, _OUT_SCHEMA)
    )


QUERIES = {
    # same oracle as the expression form — the surface must match it.
    "cogroup_asof_match": (q_cogroup_asof_match, SQL_ASOF_VIEW_BEFORE_PURCHASE),
}
