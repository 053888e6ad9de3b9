"""Planted-truth gates, TPC-H batch 3 — completes hand-derived coverage
of all 22 adapted TPC-H entries (batches 1-2: test_r13_planted.py,
test_r13_planted_tpch2.py). Corners pinned here:

- q3: both date cuts are STRICT (an order dated exactly 1998-03-15 and
  a line shipped exactly 1998-03-15 are both out), the segment filter
  binds, and the top-10 cut on a revenue tie keeps the LOWER orderkey
  (the deterministic tiebreak).
- q5: revenue counts only where customer and supplier share a nation —
  a supplier from another nation on the same order is excluded.
- q7: (cust, supp) and (supp, cust) are DISTINCT rows, same-nation
  pairs are excluded, and the year is the SHIP year (a 1997 shipment
  on a 1996 order lands in 1997).
- q9: '%red%' is a SUBSTRING match ('dark red' qualifies — the
  deliberate contrast with q20's prefix), and the profit amount
  ep*(1-disc) - 0.9*retail*qty sums signed (a negative-profit line
  subtracts).
- q10: only 'R' lines count toward lost revenue; the 'N' line on the
  same customer is invisible.
- q12: late is strict (+60 exactly is not late), URGENT/HIGH split vs
  the other three priorities, grouped per linestatus.
- q16: Brand#1 and type exactly 'SMALL' are excluded ('SMALL ANODIZED'
  survives the equality filter), size must be in the IN-list, a
  supplier with balance exactly 0.00 is NOT a complaint supplier
  (strict < 0), and supplier_cnt is DISTINCT (two lines by one
  supplier count once).
- q20: LIKE 'red%' is a PREFIX ('dark red' does not qualify), the
  HAVING qty > 30 is strict (exactly 30.00 out, 30.01 in — summed
  across lines, pinning the group-before-having), the grain is
  (supplier, part) (16 + 15 across two parts does not qualify), only
  1997 shipments count, and the supplier must sit in EUROPE.
"""

from __future__ import annotations

import pandas as pd

from movie_data_transformer_spark.operators.tpch_queries import (
    q_tpch_q3_shipping_priority,
    q_tpch_q5_local_supplier_volume,
    q_tpch_q7_nation_volume,
    q_tpch_q9_product_type_profit,
    q_tpch_q10_returned_items,
    q_tpch_q12_late_priority,
    q_tpch_q16_parts_supplier_counts,
    q_tpch_q20_potential_promotion,
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


def _orders(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                                      "o_totalprice", "o_orderdate", "o_orderpriority"])
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "orders.parquet")


def _customer(tmp_path, rows):
    pd.DataFrame(rows, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                                "c_mktsegment"]).to_parquet(tmp_path / "customer.parquet")


def _supplier(tmp_path, rows):
    pd.DataFrame(rows, columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
                 ).to_parquet(tmp_path / "supplier.parquet")


def _part(tmp_path, rows):
    pd.DataFrame(rows, columns=["p_partkey", "p_name", "p_brand", "p_type",
                                "p_size", "p_retailprice"]).to_parquet(tmp_path / "part.parquet")


def _geo(tmp_path):
    pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"]}
                 ).to_parquet(tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["NATION_0", "NATION_1", "NATION_2"],
                  "n_regionkey": [0, 1, 0]}).to_parquet(tmp_path / "nation.parquet")


def _li(key, partkey, suppkey, qty, ep, ship="1996-01-15", disc=0.0,
        flag="N", status="O"):
    return (key, partkey, suppkey, 1, qty, ep, disc, 0.0, flag, status, ship)


def test_q3_strict_dates_and_tie_at_the_limit(spark, tmp_path):
    """Orders 1..9 have revenues 999..991; orders 10 and 11 tie at 500 —
    the top-10 cut keeps orderkey 10 and drops 11. Order 20 is dated
    exactly 1998-03-15 (strict <), order 21 ships exactly 1998-03-15
    (strict >), order 22 is AUTOMOBILE: all out."""
    _customer(tmp_path, [(1, "c1", 0, 1.0, "BUILDING"), (2, "c2", 0, 1.0, "AUTOMOBILE")])
    orders, lines = [], []
    for k in range(1, 10):
        orders.append((k, 1, "F", 1.0, "1998-01-01", "1-URGENT"))
        lines.append(_li(k, 1, 1, 1.0, float(1000 - k), ship="1998-03-16"))
    for k in (10, 11):
        orders.append((k, 1, "F", 1.0, "1998-01-01", "1-URGENT"))
        lines.append(_li(k, 1, 1, 1.0, 500.0, ship="1998-03-16"))
    orders += [
        (20, 1, "F", 1.0, "1998-03-15", "1-URGENT"),
        (21, 1, "F", 1.0, "1998-01-01", "1-URGENT"),
        (22, 2, "F", 1.0, "1998-01-01", "1-URGENT"),
    ]
    lines += [
        _li(20, 1, 1, 1.0, 9999.0, ship="1998-03-16"),
        _li(21, 1, 1, 1.0, 9999.0, ship="1998-03-15"),
        _li(22, 1, 1, 1.0, 9999.0, ship="1998-03-16"),
    ]
    _orders(tmp_path, orders)
    _lineitem(tmp_path, lines)
    got = [(r.l_orderkey, r.revenue)
           for r in q_tpch_q3_shipping_priority(spark, str(tmp_path)).collect()]
    assert got == [(k, float(1000 - k)) for k in range(1, 10)] + [(10, 500.0)]


def test_q5_customer_and_supplier_share_nation(spark, tmp_path):
    """c1 (NATION_0) orders a line from s1 (NATION_0, counts: 100) and a
    line from s2 (NATION_1, excluded); c2 (NATION_1) from s2 -> 40 under
    NATION_1."""
    _geo(tmp_path)
    _customer(tmp_path, [(1, "c1", 0, 1.0, "B"), (2, "c2", 1, 1.0, "B")])
    _supplier(tmp_path, [(1, "S1", 0, 1.0), (2, "S2", 1, 1.0)])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "1996-01-01", "1-URGENT"),
        (2, 2, "F", 1.0, "1996-01-01", "1-URGENT"),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 100.0),
        _li(1, 1, 2, 1.0, 999.0),   # supplier nation != customer nation
        _li(2, 1, 2, 1.0, 40.0),
    ])
    got = {r.n_name: r.revenue
           for r in q_tpch_q5_local_supplier_volume(spark, str(tmp_path)).collect()}
    assert got == {"NATION_0": 100.0, "NATION_1": 40.0}


def test_q7_directed_pairs_and_ship_year(spark, tmp_path):
    """One line each way between NATION_0 and NATION_1 -> two DISTINCT
    rows; a same-nation line is excluded; the NATION_0->NATION_1 line
    ships in 1997 on a 1996 order, landing in ship_year 1997."""
    _geo(tmp_path)
    _customer(tmp_path, [(1, "c1", 0, 1.0, "B"), (2, "c2", 1, 1.0, "B")])
    _supplier(tmp_path, [(1, "S1", 0, 1.0), (2, "S2", 1, 1.0)])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "1996-06-01", "1-URGENT"),
        (2, 2, "F", 1.0, "1996-06-01", "1-URGENT"),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 2, 1.0, 100.0, ship="1997-02-01"),  # cust N0 <- supp N1, year 1997
        _li(2, 1, 1, 1.0, 40.0, ship="1996-07-01"),   # cust N1 <- supp N0
        _li(1, 1, 1, 1.0, 999.0, ship="1996-07-01"),  # same nation: out
    ])
    got = {(r.cust_nation, r.supp_nation, r.ship_year): r.volume
           for r in q_tpch_q7_nation_volume(spark, str(tmp_path)).collect()}
    assert got == {
        ("NATION_0", "NATION_1", 1997): 100.0,
        ("NATION_1", "NATION_0", 1996): 40.0,
    }


def test_q9_substring_red_and_signed_profit(spark, tmp_path):
    """'dark red metal' DOES match '%red%' (substring — q20's prefix gate
    is the contrast). Line 1 profit: 100*(1-0.25) - 0.9*10*2 = 57.0;
    line 2: 10 - 0.9*10*2 = -8.0 (signed); non-red line invisible.
    Expected sum 49.0 under (supplier nation, order year)."""
    _geo(tmp_path)
    _supplier(tmp_path, [(1, "S1", 0, 1.0)])
    _part(tmp_path, [
        (1, "dark red metal", "B", "T", 1, 10.0),
        (2, "blue steel", "B", "T", 1, 10.0),
    ])
    _orders(tmp_path, [(1, 1, "F", 1.0, "1996-06-01", "1-URGENT")])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 2.0, 100.0, disc=0.25),
        _li(1, 1, 1, 2.0, 10.0),
        _li(1, 2, 1, 2.0, 9999.0),
    ])
    got = q_tpch_q9_product_type_profit(spark, str(tmp_path)).collect()
    assert [(r.nation, r.o_year, r.sum_profit) for r in got] == [("NATION_0", 1996, 49.0)]


def test_q10_counts_only_returned_lines(spark, tmp_path):
    """c1: R lines 30 + 20 plus an N line 999 -> 50; c2: one R line 10.
    Ranked desc."""
    _geo(tmp_path)
    _customer(tmp_path, [(1, "c1", 0, 5.0, "B"), (2, "c2", 0, 6.0, "B")])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "1996-01-01", "1-URGENT"),
        (2, 2, "F", 1.0, "1996-01-01", "1-URGENT"),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 30.0, flag="R"),
        _li(1, 1, 1, 1.0, 20.0, flag="R"),
        _li(1, 1, 1, 1.0, 999.0, flag="N"),
        _li(2, 1, 1, 1.0, 10.0, flag="R"),
    ])
    got = [(r.c_custkey, r.revenue)
           for r in q_tpch_q10_returned_items(spark, str(tmp_path)).collect()]
    assert got == [(1, 50.0), (2, 10.0)]


def test_q12_strict_late_and_priority_split(spark, tmp_path):
    """linestatus 'O': four late lines with priorities 1-URGENT/2-HIGH
    (high) and 3-MEDIUM/5-LOW (low) -> 2/2; a +60-days-exactly URGENT
    line is NOT late and must not count. linestatus 'F': one late
    4-NOT SPECIFIED line -> 0/1."""
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (2, 1, "F", 1.0, "2024-01-01", "2-HIGH"),
        (3, 1, "F", 1.0, "2024-01-01", "3-MEDIUM"),
        (4, 1, "F", 1.0, "2024-01-01", "5-LOW"),
        (5, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (6, 1, "F", 1.0, "2024-01-01", "4-NOT SPECIFIED"),
    ])
    late, exact60 = "2024-03-02", "2024-03-01"
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 1.0, ship=late, status="O"),
        _li(2, 1, 1, 1.0, 1.0, ship=late, status="O"),
        _li(3, 1, 1, 1.0, 1.0, ship=late, status="O"),
        _li(4, 1, 1, 1.0, 1.0, ship=late, status="O"),
        _li(5, 1, 1, 1.0, 1.0, ship=exact60, status="O"),  # not late
        _li(6, 1, 1, 1.0, 1.0, ship=late, status="F"),
    ])
    got = {r.l_linestatus: (r.high_line_count, r.low_line_count)
           for r in q_tpch_q12_late_priority(spark, str(tmp_path)).collect()}
    assert got == {"O": (2, 2), "F": (0, 1)}


def test_q16_exclusions_and_distinct_supplier_count(spark, tmp_path):
    """pk1 (Brand#2, LARGE, 5): s1 (balance exactly 0.00 — NOT a
    complaint supplier, strict < 0) ships two lines (distinct-counts
    once) and s3 one -> cnt 2; s2 (-0.01) is anti-joined out. pk2
    Brand#1, pk3 type exactly 'SMALL', pk5 size 7 (not in the IN-list):
    all excluded. pk4's type 'SMALL ANODIZED' survives the equality
    filter -> cnt 1."""
    _supplier(tmp_path, [
        (1, "S1", 0, 0.0), (2, "S2", 0, -0.01), (3, "S3", 0, 5.0),
    ])
    _part(tmp_path, [
        (1, "p1", "Brand#2", "LARGE", 5, 1.0),
        (2, "p2", "Brand#1", "LARGE", 5, 1.0),
        (3, "p3", "Brand#2", "SMALL", 5, 1.0),
        (4, "p4", "Brand#2", "SMALL ANODIZED", 5, 1.0),
        (5, "p5", "Brand#2", "LARGE", 7, 1.0),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 1.0), _li(2, 1, 1, 1.0, 1.0),  # s1 twice: once
        _li(3, 1, 2, 1.0, 1.0),                           # complaint supplier
        _li(4, 1, 3, 1.0, 1.0),
        _li(5, 2, 3, 1.0, 1.0), _li(6, 3, 3, 1.0, 1.0),
        _li(7, 4, 3, 1.0, 1.0), _li(8, 5, 3, 1.0, 1.0),
    ])
    got = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt
           for r in q_tpch_q16_parts_supplier_counts(spark, str(tmp_path)).collect()}
    assert got == {
        ("Brand#2", "LARGE", 5): 2,
        ("Brand#2", "SMALL ANODIZED", 5): 1,
    }


def test_q20_prefix_match_strict_having_and_pair_grain(spark, tmp_path):
    """Only S1 qualifies: 20.00 + 10.01 on one red part in 1997 (the
    strict > 30 crossed by the SUM, pinning group-before-having). S2
    sums exactly 30.00 (out), S3's part is 'dark red' (prefix 'red%'
    fails), S4 splits 16 + 15 across two different parts (per-pair
    grain), S5 ships 100 but sits in ASIA, S6 ships 100 in 1996."""
    _geo(tmp_path)
    _supplier(tmp_path, [
        (1, "S1", 0, 11.0), (2, "S2", 0, 1.0), (3, "S3", 0, 1.0),
        (4, "S4", 2, 1.0), (5, "S5", 1, 1.0), (6, "S6", 0, 1.0),
    ])
    _part(tmp_path, [
        (1, "red shiny", "B", "T", 1, 1.0),
        (2, "dark red", "B", "T", 1, 1.0),
        (3, "red dull", "B", "T", 1, 1.0),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 20.0, 1.0, ship="1997-03-01"),
        _li(2, 1, 1, 10.01, 1.0, ship="1997-05-01"),
        _li(3, 1, 2, 30.0, 1.0, ship="1997-03-01"),   # exactly 30: out
        _li(4, 2, 3, 100.0, 1.0, ship="1997-03-01"),  # 'dark red': not a prefix
        _li(5, 1, 4, 16.0, 1.0, ship="1997-03-01"),   # two parts, neither > 30
        _li(6, 3, 4, 15.0, 1.0, ship="1997-03-01"),
        _li(7, 1, 5, 100.0, 1.0, ship="1997-03-01"),  # ASIA supplier
        _li(8, 1, 6, 100.0, 1.0, ship="1996-03-01"),  # wrong year
    ])
    got = [(r.s_name, r.s_acctbal)
           for r in q_tpch_q20_potential_promotion(spark, str(tmp_path)).collect()]
    assert got == [("S1", 11.0)]
