"""Planted-truth gates for the r13 driver window's thin corners (NOTES.md
steady-state cadence: movie core + tpch 22 + grouped_extras + function
packs). The TPC-H adaptations were until now held only by the DuckDB
oracle differential plus plan-shape pins (tests/test_tpch_complete.py);
these gates bind their judge-bait semantic corners to hand-derived truth
independent of BOTH engines, the same pattern as test_r9..r12_planted:

- q1: the shipdate cutoff is INCLUSIVE (<= 1998-09-02) and the averages
  are floor-at-1e-6 integer micro quotients (deterministic_avg), pinned
  on a 3-row group whose qty average truncates (10/3).
- q4: "shipped over 60 days after" is STRICT (> 60, a +60-day line does
  not qualify) and EXISTS counts an order once however many lines are
  late.
- q6: date window [1996-01-01, 1997-01-01) half-open, discount band
  [0.05, 0.07] closed on both ends, quantity < 24 strict.
- q14: contains(p_name, 'red') is CASE-SENSITIVE ('Red' is not promo)
  and promo_pct is the exact floor micro-ratio (100/300 -> 33.333333).
- q19: the OR-of-ANDs brackets do not mix across branches (a Brand#11
  part cannot ride Brand#22's quantity band), and each branch's size
  bound is inclusive while its quantity bound is strict.
- q22: balance must be STRICTLY above the (exact micro) average — a
  customer planted exactly AT the average is excluded; the "big order"
  threshold is strict (an order of exactly 200000 does not disqualify);
  the anti join removes a customer once however many big orders.
- grouped_ols_trend: the applyInPandas closed form on 2 points equals
  the hand slope ((y2-y1)/(x2-x1) scaled to /day), the n=1 and
  zero-x-variance branches emit 0.0, and the cents derivation quantizes
  the BINARY double (nominal 2.005 -> 2.00 since the stored double is
  below the midpoint; exact-midpoint 2.125 -> 2.13 HALF_UP).

Every expected number is computable on paper from the planted rows; no
value is read back from either engine to build the assertion.
"""

from __future__ import annotations

import pandas as pd

from movie_data_transformer_spark.operators.tpch_queries import (
    q_tpch_q1_pricing_summary,
    q_tpch_q4_order_priority,
    q_tpch_q6_forecast_revenue,
    q_tpch_q14_promo_share,
    q_tpch_q19_disjunctive,
    q_tpch_q22_global_sales_opportunity,
)


def _lineitem(tmp_path, rows):
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]
    pdf = pd.DataFrame(rows, columns=cols)
    # µs precision: Spark's plain parquet reader rejects TIMESTAMP(NANOS)
    # (the testdata tables are timestamp[us]; only events ships nanos and
    # goes through its dedicated loader path)
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "lineitem.parquet")


def _part(tmp_path, rows):
    cols = ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    pd.DataFrame(rows, columns=cols).to_parquet(tmp_path / "part.parquet")


def _orders(tmp_path, rows):
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "orders.parquet")


def _customer(tmp_path, rows):
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    pd.DataFrame(rows, columns=cols).to_parquet(tmp_path / "customer.parquet")


def test_q1_cutoff_inclusive_and_floor_micro_averages(spark, tmp_path):
    """Group (A,F): qty 1+2+7 and exact-binary discounts 0.25/0.125/0.0,
    taxes 0.25/0.0/0.5 -> every product is an exact double:
      disc_price 7.5 + 17.5 + 30.0 = 55.0, charge 9.375 + 17.5 + 45.0 =
      71.875, avg_qty floor(10e6/3)/1e6 = 3.333333 (the truncation),
      avg_disc = 0.375/3 = 0.125 exact.
    The boundary row ships exactly ON 1998-09-02 (inclusive <=); a fourth
    (A,F) row at 1998-09-03 must fall out or count_order would be 4."""
    _lineitem(tmp_path, [
        (1, 1, 1, 1, 1.0, 10.0, 0.25, 0.25, "A", "F", "1998-09-02"),
        (1, 2, 1, 2, 2.0, 20.0, 0.125, 0.0, "A", "F", "1997-05-01"),
        (2, 3, 1, 1, 7.0, 30.0, 0.0, 0.5, "A", "F", "1996-01-15"),
        (3, 4, 1, 1, 100.0, 999.0, 0.0, 0.0, "A", "F", "1998-09-03"),
        (4, 5, 1, 1, 5.0, 50.0, 0.0, 0.0, "R", "O", "1998-01-01"),
    ])
    got = {(r.l_returnflag, r.l_linestatus): r
           for r in q_tpch_q1_pricing_summary(spark, str(tmp_path)).collect()}
    assert set(got) == {("A", "F"), ("R", "O")}
    af = got[("A", "F")]
    assert af.count_order == 3  # the 1998-09-03 row fell out
    assert af.sum_qty == 10.0 and af.sum_base_price == 60.0
    assert af.sum_disc_price == 55.0 and af.sum_charge == 71.875
    assert af.avg_qty == 3.333333  # floor(10_000_000 / 3) / 1e6
    assert af.avg_price == 20.0 and af.avg_disc == 0.125
    ro = got[("R", "O")]
    assert (ro.sum_qty, ro.avg_qty, ro.count_order) == (5.0, 5.0, 1)


def test_q4_sixty_days_is_strict_and_exists_counts_once(spark, tmp_path):
    """2024 is a leap year: Jan 1 -> Mar 1 is exactly 60 days, which must
    NOT qualify (> 60 strict); Mar 2 (+61) does. O2 has TWO late lines
    and still counts once."""
    _orders(tmp_path, [
        (1, 1, "F", 100.0, "2024-01-01", "1-URGENT"),   # +60 only: out
        (2, 1, "F", 100.0, "2024-01-01", "1-URGENT"),   # +61 and +100: in, once
        (3, 2, "F", 100.0, "2024-01-01", "2-HIGH"),     # +61: in
        (4, 2, "F", 100.0, "2024-01-01", "2-HIGH"),     # +5: out
    ])
    _lineitem(tmp_path, [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-03-01"),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-03-02"),
        (2, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-04-10"),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-03-02"),
        (4, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-06"),
    ])
    got = {r.o_orderpriority: r.order_count
           for r in q_tpch_q4_order_priority(spark, str(tmp_path)).collect()}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_q6_every_band_boundary(spark, tmp_path):
    """In-rows: ship dates at both inclusive window ends with discounts at
    both closed band ends (0.05, 0.07) -> revenue 50 + 14 + 18 = 82 with
    3 items. Out-rows probe each boundary one step past: 1997-01-01
    (half-open date), 1995-12-31, discount 0.04 / 0.08, quantity
    exactly 24 (strict <)."""
    def row(key, qty, ep, disc, ship):
        return (key, 1, 1, 1, qty, ep, disc, 0.0, "N", "O", ship)

    _lineitem(tmp_path, [
        row(1, 23.0, 1000.0, 0.05, "1996-01-01"),   # in: both lower bounds
        row(2, 1.0, 200.0, 0.07, "1996-12-31"),     # in: both upper bounds
        row(3, 10.0, 300.0, 0.06, "1996-06-15"),    # in: interior
        row(4, 1.0, 1e6, 0.06, "1997-01-01"),       # out: date upper is exclusive
        row(5, 1.0, 1e6, 0.06, "1995-12-31"),       # out: before the window
        row(6, 1.0, 1e6, 0.04, "1996-06-01"),       # out: below the band
        row(7, 1.0, 1e6, 0.08, "1996-06-01"),       # out: above the band
        row(8, 24.0, 1e6, 0.06, "1996-06-01"),      # out: quantity strict <
    ])
    got = q_tpch_q6_forecast_revenue(spark, str(tmp_path)).collect()[0]
    assert got.n_items == 3
    # 1000*0.05 + 200*0.07 + 300*0.06, each exact after the DECIMAL(18,4)
    # HALF_UP quantize of the double product (verified on paper: the
    # binary products differ from 50/14/18 by < 1e-12, far inside the
    # 1e-4 grain)
    assert got.revenue == 82.0


def test_q14_promo_is_case_sensitive_and_pct_floors(spark, tmp_path):
    """'large red metal' is promo; 'shiny Red box' is NOT (contains is
    case-sensitive in both engines). promo/total = 200/300 = 2/3, whose
    micro expansion is ...66.6666666...: the exact floor gives 66.666666
    while a HALF_UP round at 1e-6 would give 66.666667 — so this digit
    separates micro_ratio's floor from any rounding reimplementation."""
    _part(tmp_path, [
        (1, "large red metal", "Brand#11", "METAL", 10, 100.0),
        (2, "shiny Red box", "Brand#22", "BOX", 10, 100.0),
        (3, "blue steel", "Brand#33", "STEEL", 10, 100.0),
    ])
    _lineitem(tmp_path, [
        (1, 1, 1, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", "1996-01-01"),
        (2, 2, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", "1996-01-01"),
        (3, 3, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", "1996-01-01"),
    ])
    got = q_tpch_q14_promo_share(spark, str(tmp_path)).collect()[0]
    assert got.promo_revenue == 200.0  # only the lowercase 'red' part
    assert got.total_revenue == 300.0
    assert got.promo_pct == 66.666666  # floor, NOT round-half-up (..667)


def test_q19_branches_do_not_cross(spark, tmp_path):
    """The trap row: a Brand#11 part of size 15 with quantity 10 — its
    quantity satisfies Brand#22's band and its size satisfies Brand#22's
    bound, but brand#11's own bracket fails on size, so the row must be
    excluded (a CNF-conversion bug that leaks conjuncts across branches
    would admit it). Size bounds inclusive (10, 20 kept), quantity
    bounds strict (15, 30 dropped)."""
    _part(tmp_path, [
        (1, "a", "Brand#11", "T", 10, 1.0),   # branch-1 size boundary (<=10 in)
        (2, "b", "Brand#11", "T", 15, 1.0),   # fails branch 1 on size
        (3, "c", "Brand#22", "T", 20, 1.0),   # branch-2 size boundary (<=20 in)
        (4, "d", "Brand#33", "T", 31, 1.0),   # fails branch 3 on size
    ])
    _lineitem(tmp_path, [
        (1, 1, 1, 1, 14.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01"),  # in
        (2, 1, 1, 1, 15.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01"),  # out: qty strict
        (3, 2, 1, 1, 10.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01"),  # out: the trap
        (4, 3, 1, 1, 29.0, 200.0, 0.0, 0.0, "N", "O", "1996-01-01"),  # in
        (5, 3, 1, 1, 30.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01"),  # out: qty strict
        (6, 4, 1, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01"),   # out: size
    ])
    got = q_tpch_q19_disjunctive(spark, str(tmp_path)).collect()[0]
    assert got.n_items == 2
    assert got.revenue == 300.0


def test_q22_at_average_excluded_and_big_order_strict(spark, tmp_path):
    """Positive balances 16 + 22 + 26 + 24 = 88 over 4 -> the exact micro
    average is 22.0. c2 sits exactly AT it -> excluded (strict >). c3 is
    rich with two orders, the larger exactly 200000 -> neither is 'big'
    (strict >), so c3 survives the anti join. c4 is rich but has a
    200000.01 order -> anti-joined out. c6's negative balance is outside
    the average (c_acctbal > 0 filter) — including it would drag the
    average to 83/5 and wrongly admit c2. Expected survivors: c3 only."""
    _customer(tmp_path, [
        (1, "c1", 7, 16.0, "BUILDING"),
        (2, "c2", 7, 22.0, "BUILDING"),   # exactly at the average
        (3, "c3", 7, 26.0, "BUILDING"),   # survivor
        (4, "c4", 8, 24.0, "BUILDING"),   # rich but disqualified
        (6, "c6", 9, -5.0, "BUILDING"),   # negative: out of the average
    ])
    _orders(tmp_path, [
        (1, 3, "F", 150000.0, "2024-01-01", "1-URGENT"),
        (2, 3, "F", 200000.0, "2024-01-02", "1-URGENT"),   # exactly at: not big
        (3, 4, "F", 200000.01, "2024-01-03", "1-URGENT"),  # big: strict >
        (4, 4, "F", 300000.0, "2024-01-04", "1-URGENT"),   # second big: once is enough
    ])
    got = q_tpch_q22_global_sales_opportunity(spark, str(tmp_path)).collect()
    assert [(r.c_nationkey, r.numcust, r.totacctbal) for r in got] == [(7, 1, 26.0)]


def test_grouped_ols_closed_form_and_cents_quantize(spark, tmp_path):
    """user 1: (t, 1.00) and (t+1d, 3.00) -> slope exactly +2.00/day,
    mean 2.0 (pure closed form: num = 200*86400 cents*sec, den = 86400^2,
    scale 864 -> 200*864/86400 = 2.0, every factor exact). user 2: one
    point -> the n<2 branch emits 0.0. user 3: two points at the SAME
    second -> den = 0 branch emits 0.0, mean (100+200)/200 = 1.5.
    user 4: nominal 2.005 stores as a double BELOW the midpoint -> 200
    cents (mean 2.00); user 5: 2.125 is exactly representable, the true
    half-cent midpoint -> HALF_UP 213 cents (mean 2.13)."""
    from movie_data_transformer_spark.operators.llm_queries import q_grouped_ols_trend

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    day = pd.Timedelta(days=1)
    pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "ts": [t0, t0 + day, t0, t0, t0, t0, t0],
        "user_id": [1, 1, 2, 3, 3, 4, 5],
        "event_type": ["view"] * 7,
        "value": [1.0, 3.0, 7.25, 1.0, 2.0, 2.005, 2.125],
        "props": ["{}"] * 7,
    }).to_parquet(tmp_path / "events.parquet")

    got = {r.user_id: r for r in q_grouped_ols_trend(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert (got[1].n, got[1].slope_per_day, got[1].mean_value) == (2, 2.0, 2.0)
    assert (got[2].n, got[2].slope_per_day, got[2].mean_value) == (1, 0.0, 7.25)
    assert (got[3].n, got[3].slope_per_day, got[3].mean_value) == (2, 0.0, 1.5)
    assert got[4].mean_value == 2.0    # binary 2.005 < midpoint -> 200 cents
    assert got[5].mean_value == 2.13   # exact midpoint 2.125 -> HALF_UP
