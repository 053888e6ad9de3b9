"""Planted-truth gates, function-pack batch 3 — completes hand-derived
coverage of all 18 function-pack entries (batches 1-2:
test_r13_planted_packs.py / _packs2.py). Corners pinned here:

- correlated_subquery: the threshold is STRICT (an order exactly at
  2x its customer's average is out — plantable only with a zero-priced
  sibling, which is the point), and a single-order customer can never
  qualify because its own order IS the average.
- funnel_conversion: step timestamps are FIRST occurrences (a later
  in-order view cannot repair an earlier out-of-order one), ties are
  not progress (view at exactly the signup instant fails strict >),
  and step 3 is gated on step 2 (purchase after view counts for
  nothing if the view step failed).
- retention_cohorts: ages are exact day differences (day 8 is age 7),
  same-day repeat events collapse (distinct), and cohort_size counts
  every first-seen user including never-returning ones.
- unpivot_rates: one wide row becomes exactly two long rows carrying
  the source column names.
"""

from __future__ import annotations

import pandas as pd

from movie_data_transformer_spark.operators.function_packs import (
    q_correlated_subquery,
    q_funnel_conversion,
    q_retention_cohorts,
    q_unpivot_rates,
)


def _orders(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                                      "o_totalprice", "o_orderdate", "o_orderpriority"])
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "orders.parquet")


def _events(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                      "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet")


def test_correlated_subquery_strict_double_average(spark, tmp_path):
    """c1 {10, 10, 100}: avg 40, threshold 80 -> only the 100 order.
    c2's single 50-order can never beat twice its own average. c4
    {0, 40}: avg 20, threshold 40 -> the 40 order sits exactly AT the
    threshold and strict > excludes it."""
    _orders(tmp_path, [
        (1, 1, "F", 10.0, "1996-01-01", "x"),
        (2, 1, "F", 10.0, "1996-01-02", "x"),
        (3, 1, "F", 100.0, "1996-01-03", "x"),
        (4, 2, "F", 50.0, "1996-01-04", "x"),
        (5, 4, "F", 0.0, "1996-01-05", "x"),
        (6, 4, "F", 40.0, "1996-01-06", "x"),
    ])
    got = [(r.o_orderkey, r.o_custkey, r.o_totalprice)
           for r in q_correlated_subquery(spark, str(tmp_path)).collect()]
    assert got == [(3, 1, 100.0)]


def test_funnel_first_occurrence_and_strict_order(spark, tmp_path):
    """u1: clean signup -> view -> purchase: 1/1/1. u2: a view BEFORE
    signup and another after — min(view) predates signup, so step 2
    fails even though an in-order view exists: 1/0/0. u3: view at
    EXACTLY the signup instant (tie is not progress): 1/0/0. u4:
    purchase after view but signup missing: 0/0/0. u5: signup and view
    in order, purchase BEFORE the view: 1/1/0."""
    _events(tmp_path, [
        (1, "2024-01-01 00:00", 1, "signup", 1.0, "{}"),
        (2, "2024-01-01 01:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 02:00", 1, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:30", 2, "view", 1.0, "{}"),
        (5, "2024-01-01 01:00", 2, "signup", 1.0, "{}"),
        (6, "2024-01-01 02:00", 2, "view", 1.0, "{}"),
        (7, "2024-01-01 00:00", 3, "signup", 1.0, "{}"),
        (8, "2024-01-01 00:00", 3, "view", 1.0, "{}"),
        (9, "2024-01-01 00:00", 4, "view", 1.0, "{}"),
        (10, "2024-01-01 01:00", 4, "purchase", 1.0, "{}"),
        (11, "2024-01-01 00:00", 5, "signup", 1.0, "{}"),
        (12, "2024-01-01 02:00", 5, "view", 1.0, "{}"),
        (13, "2024-01-01 01:00", 5, "purchase", 1.0, "{}"),
    ])
    got = {r.user_id: (r.did_signup, r.did_view_after, r.did_purchase_after)
           for r in q_funnel_conversion(spark, str(tmp_path)).collect()}
    assert got == {
        1: (1, 1, 1),
        2: (1, 0, 0),
        3: (1, 0, 0),
        4: (0, 0, 0),
        5: (1, 1, 0),
    }


def test_retention_exact_day_ages_and_distinct_days(spark, tmp_path):
    """Cohort 2024-01-01: u1 returns on day 1 (twice — collapses) and
    day 8 (age 7); u2 never returns; u3 returns on day 2 (neither
    window). Cohort 2024-01-02: u4 returns next day."""
    _events(tmp_path, [
        (1, "2024-01-01 09:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-02 09:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-02 18:00", 1, "view", 1.0, "{}"),
        (4, "2024-01-08 09:00", 1, "view", 1.0, "{}"),
        (5, "2024-01-01 10:00", 2, "view", 1.0, "{}"),
        (6, "2024-01-01 11:00", 3, "view", 1.0, "{}"),
        (7, "2024-01-03 11:00", 3, "view", 1.0, "{}"),
        (8, "2024-01-02 08:00", 4, "view", 1.0, "{}"),
        (9, "2024-01-03 08:00", 4, "view", 1.0, "{}"),
    ])
    got = {str(r.cohort_day): (r.cohort_size, r.d1_retained, r.d7_retained)
           for r in q_retention_cohorts(spark, str(tmp_path)).collect()}
    assert got == {
        "2024-01-01": (3, 1, 1),
        "2024-01-02": (1, 1, 0),
    }


def test_unpivot_one_row_becomes_two(spark, tmp_path):
    pdf = pd.DataFrame(
        [(1, 1, 1, 7, 5.0, 1.0, 0.5, 0.25, "N", "O", "1996-01-01")],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    got = sorted((r.rate_type, r.rate, r.l_orderkey, r.l_linenumber)
                 for r in q_unpivot_rates(spark, str(tmp_path)).collect())
    assert got == [("l_discount", 0.5, 1, 7), ("l_tax", 0.25, 1, 7)]
