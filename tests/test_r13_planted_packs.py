"""Planted-truth gates for the function-pack entries in the r13 driver
window (function_packs.py leads the r13 re-green straddle; NOTES.md).
Like test_r13_planted.py, every expected value is hand-derivable from the
planted rows, independent of both engines:

- agg_percentiles_exact: the continuous-interpolation formula
  q = v[i] + frac * (v[i+1] - v[i]) at position p*(n-1), pinned at an
  exact index (no interpolation), a 0.6-fraction interpolation, a
  single-row group (every percentile == the value) and a 2-row midpoint.
- date_spine_gap_fill: the spine emits ALL 31 January days (zeros
  included); events one second outside either month edge must not leak
  in, a midnight event lands on its own day.
- window_running_distinct: a repeated type does not grow the running
  set, and a same-timestamp pair is ordered by event_id (the documented
  (ts, event_id) tiebreak) — reversing the tiebreak would swap the two
  emitted counts.
- agg_ordered_concat: nation keys sort as STRINGS ('10' < '2') and
  duplicates collapse (collect_set).
- histogram_values: bucket = floor(v/25) — FLOOR, not truncation:
  -1 lands in bucket -1 (truncation would give 0) and -26 in bucket -2;
  the 25.0 edge opens bucket 1.
- null_handling: nullif fires exactly on 25.0 and try_divide yields
  NULL (never an error) on the engineered zero denominator.
- window_analytics: percent_rank/cume_dist over the suppkey-tiebroken
  total order are (rank-1)/(n-1) and rank/n with NO peers, while the
  RANGE-framed count n_le_bal DOES include balance peers — the planted
  tie separates the two frame semantics.
"""

from __future__ import annotations

import pandas as pd

from movie_data_transformer_spark.operators.function_packs import (
    q_agg_ordered_concat,
    q_agg_percentiles_exact,
    q_date_spine_gap_fill,
    q_histogram_values,
    q_null_handling,
    q_window_analytics,
    q_window_running_distinct,
)

_LI_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]


def _lineitem(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=_LI_COLS)
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "lineitem.parquet")


def _events(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet")


def test_percentile_interpolation_formula(spark, tmp_path):
    """Group A (5 rows): p50 position 0.5*4 = 2 exactly -> 30 (no
    interpolation); p90 position 3.6 -> 400 + 0.6*100 = 460; p25
    position 1.0 -> 0.1 exactly. Group B (1 row): every percentile is
    the lone value. Group C (2 rows): p50 = midpoint 1.5, p90 = 1.9,
    p25 = 1.25."""
    def row(key, flag, qty, ep, disc):
        return (key, 1, 1, 1, qty, ep, disc, 0.0, flag, "O", "1996-01-01")

    _lineitem(tmp_path, [
        row(1, "A", 10.0, 100.0, 0.0),
        row(2, "A", 20.0, 200.0, 0.1),
        row(3, "A", 30.0, 300.0, 0.2),
        row(4, "A", 40.0, 400.0, 0.3),
        row(5, "A", 50.0, 500.0, 0.4),
        row(6, "B", 7.0, 70.0, 0.3),
        row(7, "C", 1.0, 1.0, 1.0),
        row(8, "C", 2.0, 2.0, 2.0),
    ])
    got = {r.l_returnflag: r
           for r in q_agg_percentiles_exact(spark, str(tmp_path)).collect()}
    assert (got["A"].p50_qty, got["A"].p90_price, got["A"].p25_disc) == (30.0, 460.0, 0.1)
    assert (got["B"].p50_qty, got["B"].p90_price, got["B"].p25_disc) == (7.0, 70.0, 0.3)
    assert (got["C"].p50_qty, got["C"].p90_price, got["C"].p25_disc) == (1.5, 1.9, 1.25)


def test_date_spine_zero_fills_and_month_edges(spark, tmp_path):
    """Jan 5 has 3 events (one at exact midnight), Jan 31 one at the last
    second; 2023-12-31 23:59:59 and 2024-02-01 00:00:00 are one step
    outside and must not appear or shift any count. All other 29 days
    exist with n_events = 0."""
    _events(tmp_path, [
        (1, "2024-01-05 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-05 09:30:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-05 23:59:59", 2, "view", 1.0, "{}"),
        (4, "2024-01-31 23:59:59", 2, "view", 1.0, "{}"),
        (5, "2023-12-31 23:59:59", 3, "view", 1.0, "{}"),
        (6, "2024-02-01 00:00:00", 3, "view", 1.0, "{}"),
    ])
    got = {str(r.day): r.n_events
           for r in q_date_spine_gap_fill(spark, str(tmp_path)).collect()}
    assert len(got) == 31
    assert got["2024-01-05"] == 3
    assert got["2024-01-31"] == 1
    assert sum(got.values()) == 4  # nothing leaked across the month edges
    assert got["2024-01-01"] == 0 and got["2024-01-20"] == 0


def test_running_distinct_repeat_flat_and_ts_tiebreak(spark, tmp_path):
    """user 1 in (ts, event_id) order: a(1) a(1) b(2) then a same-second
    pair where id 4 brings 'c' (3) and id 5 brings 'd' (4). A reversed
    tiebreak would emit id5 -> 3 and id4 -> 4 instead."""
    _events(tmp_path, [
        (1, "2024-01-01 00:00:01", 1, "a", 1.0, "{}"),
        (2, "2024-01-01 00:00:02", 1, "a", 1.0, "{}"),
        (3, "2024-01-01 00:00:03", 1, "b", 1.0, "{}"),
        (4, "2024-01-01 00:00:04", 1, "c", 1.0, "{}"),
        (5, "2024-01-01 00:00:04", 1, "d", 1.0, "{}"),
    ])
    got = {r.event_id: r.n_distinct_types
           for r in q_window_running_distinct(spark, str(tmp_path)).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}


def test_ordered_concat_sorts_as_strings(spark, tmp_path):
    """Nation keys {2, 10} concatenate as '10,2' — string order, the
    documented cross-engine convention — and the duplicate key 10
    collapses while n_customers still counts all three rows."""
    pd.DataFrame({
        "c_custkey": [1, 2, 3, 4],
        "c_name": ["a", "b", "c", "d"],
        "c_nationkey": [2, 10, 10, 3],
        "c_acctbal": [1.0, 1.0, 1.0, 1.0],
        "c_mktsegment": ["S1", "S1", "S1", "S2"],
    }).to_parquet(tmp_path / "customer.parquet")
    got = {r.c_mktsegment: r for r in q_agg_ordered_concat(spark, str(tmp_path)).collect()}
    assert got["S1"].nations_csv == "10,2"
    assert got["S1"].n_customers == 3
    assert got["S2"].nations_csv == "3"


def test_histogram_floor_buckets_negatives_down(spark, tmp_path):
    """floor(v/25): -26 -> -2, -25 -> -1, -1 -> -1 (truncation would say
    0), 0 and 24.999 -> 0, 25 and 49.99 -> 1."""
    vals = [-26.0, -25.0, -1.0, 0.0, 24.999, 25.0, 49.99]
    _events(tmp_path, [
        (i, "2024-01-01", 1, "view", v, "{}") for i, v in enumerate(vals)
    ])
    got = {r.bucket: r.n for r in q_histogram_values(spark, str(tmp_path)).collect()}
    assert got == {-2: 1, -1: 2, 0: 2, 1: 2}


def test_null_handling_fires_exactly_on_25(spark, tmp_path):
    """qty 25.0 -> NULL / default -1 / 'was_25' / flag 1 / try_div NULL;
    qty 26 -> try_div exactly 1.0; qty 24 -> -1.0."""
    def row(key, qty):
        return (key, 1, 1, 1, qty, 1.0, 0.0, 0.0, "N", "O", "1996-01-01")

    _lineitem(tmp_path, [row(1, 25.0), row(2, 26.0), row(3, 24.0)])
    got = {r.l_orderkey: r for r in q_null_handling(spark, str(tmp_path)).collect()}
    r25 = got[1]
    assert r25.qty_nullable is None and r25.qty_or_default == -1.0
    assert r25.null_tag == "was_25" and r25.is_null_flag == 1
    assert r25.try_div is None
    assert got[2].try_div == 1.0 and got[2].null_tag == "other"
    assert got[3].try_div == -1.0 and got[3].qty_or_default == 24.0


def test_window_analytics_peers_range_vs_total_order(spark, tmp_path):
    """Nation 1 balances 100, 200, 200, 300 (suppkeys 1..4): the ROW
    window is tiebroken by suppkey so percent_rank = (i-1)/3 and
    cume_dist = i/4 with no peers; the RANGE frame on balance alone
    keeps the 200/200 pair as peers, so BOTH get n_le_bal = 3. A
    single-supplier nation pins percent_rank's n=1 -> 0.0 branch."""
    pd.DataFrame({
        "s_suppkey": [1, 2, 3, 4, 5],
        "s_name": ["a", "b", "c", "d", "e"],
        "s_nationkey": [1, 1, 1, 1, 2],
        "s_acctbal": [100.0, 200.0, 200.0, 300.0, 42.0],
    }).to_parquet(tmp_path / "supplier.parquet")
    got = {r.s_suppkey: r for r in q_window_analytics(spark, str(tmp_path)).collect()}
    assert all(got[k].poorest == 1 for k in (1, 2, 3, 4))
    assert [got[k].pct_rank for k in (1, 2, 3, 4)] == [0.0, 0.333333, 0.666667, 1.0]
    assert [got[k].cume for k in (1, 2, 3, 4)] == [0.25, 0.5, 0.75, 1.0]
    assert [got[k].n_le_bal for k in (1, 2, 3, 4)] == [1, 3, 3, 4]
    assert (got[5].pct_rank, got[5].cume, got[5].n_le_bal) == (0.0, 1.0, 1)
