"""Planted-truth gates, TPC-H batch 2 (r13 window, see
test_r13_planted.py for batch 1 and the pattern statement). These pin
the adapted queries' exact-arithmetic thresholds and join semantics on
hand-built fixtures:

- q2: per-(part,supplier) cost is integer micro-dollars
  (cents*10000 div qty) with FLOOR division (10.00/3 -> 3.333333, never
  ...334); the correlated MIN keeps BOTH suppliers of an exact tie; a
  cheaper non-EUROPE supplier and out-of-filter parts (size 15, SMALL)
  must not appear.
- q8: market share is the exact floor micro-ratio (200/300 ->
  0.666666, not round's ...667); a non-EUROPE customer's order is
  invisible even when supplied by NATION_0.
- q11: the cross-multiplied threshold cents*10*n > 11*total is STRICT —
  a part planted exactly at 110% of the mean is excluded — and an
  ASIA-supplied shipment must not inflate a part's value (its leak
  would provably change the surviving row set).
- q13: zero-order customers appear in the c_count = 0 bucket, and the
  priority exclusion lives in the JOIN condition — a customer with
  ONLY '5-LOW' orders lands in bucket 0 rather than disappearing.
- q15: the scalar-MAX keeps EVERY tied top supplier (rank, not
  row_number), and the revenue window [1996-01-01, 1996-04-01) is
  half-open on the right.
- q17: the cross-multiplied small-quantity test qty*5*cnt < sum is
  STRICT (a row planted exactly at 0.2x the part's average is out),
  the average is per-part over ALL of that part's lines, and the
  brand/size part filter gates which lines can score at all.
- q18: HAVING sum_qty > 250 is strict — an order totalling exactly
  250.00 is out, 250.01 is in (exact decimal, no double drift).
- q21: only 'F' orders count; the candidate needs ANOTHER supplier on
  the order (single-supplier late orders are out) and NO other LATE
  supplier (mutual lateness cancels); +60 days exactly is not late;
  and numwait counts qualifying LINES (two late lines by one supplier
  on one order score 2).
"""

from __future__ import annotations

import pandas as pd

from movie_data_transformer_spark.operators.tpch_queries import (
    q_tpch_q2_min_cost_supplier,
    q_tpch_q8_market_share,
    q_tpch_q11_important_stock,
    q_tpch_q13_order_distribution,
    q_tpch_q15_top_supplier,
    q_tpch_q17_small_quantity_revenue,
    q_tpch_q18_large_volume_customer,
    q_tpch_q21_suppliers_who_kept_waiting,
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
    """region 0 = EUROPE, 1 = ASIA; nation 0 = NATION_0 (EUROPE),
    1 = NATION_1 (ASIA), 2 = NATION_2 (EUROPE)."""
    pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"]}
                 ).to_parquet(tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["NATION_0", "NATION_1", "NATION_2"],
                  "n_regionkey": [0, 1, 0]}).to_parquet(tmp_path / "nation.parquet")


def _li(key, partkey, suppkey, qty, ep, ship="1996-01-15", disc=0.0):
    return (key, partkey, suppkey, 1, qty, ep, disc, 0.0, "N", "O", ship)


def test_q2_floor_micro_cost_tie_and_region_cut(spark, tmp_path):
    """pk1: s1 wins at 2.5 (his own 99.90 row loses the per-pair MIN);
    s2's 10.00/3 floors to 3.333333; s3 is cheapest of all at 1.0 but
    sits in ASIA. pk2: s1 and s2 tie at exactly 2.5 -> both rows kept.
    pk5 pins the floored output digit (3.333333). Parts of size 15
    (strict < 15) and type SMALL never appear."""
    _geo(tmp_path)
    _supplier(tmp_path, [
        (1, "S1", 0, 10.0), (2, "S2", 0, 10.0), (3, "S3", 1, 10.0),
    ])
    _part(tmp_path, [
        (1, "p1", "B", "LARGE", 5, 1.0),
        (2, "p2", "B", "LARGE", 14, 1.0),   # size boundary: 14 in
        (3, "p3", "B", "LARGE", 15, 1.0),   # 15 out (strict)
        (4, "p4", "B", "SMALL", 5, 1.0),    # type out
        (5, "p5", "B", "LARGE", 1, 1.0),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 4.0, 10.00),    # 2.500000
        _li(2, 1, 1, 1.0, 99.90),    # same pair, loses its own MIN
        _li(3, 1, 2, 3.0, 10.00),    # 3.333333: loses pk1
        _li(4, 1, 3, 1.0, 1.00),     # cheapest but ASIA
        _li(5, 2, 1, 8.0, 20.00),    # 2.500000 \ exact tie:
        _li(6, 2, 2, 4.0, 10.00),    # 2.500000 / both kept
        _li(7, 3, 1, 1.0, 1.00),     # part size 15: out
        _li(8, 4, 1, 1.0, 1.00),     # part SMALL: out
        _li(9, 5, 2, 3.0, 10.00),    # floored 3.333333 surfaces
    ])
    got = sorted(
        (r.p_partkey, r.s_name, r.cost)
        for r in q_tpch_q2_min_cost_supplier(spark, str(tmp_path)).collect()
    )
    assert got == [
        (1, "S1", 2.5),
        (2, "S1", 2.5), (2, "S2", 2.5),
        (5, "S2", 3.333333),
    ]


def test_q8_share_floors_and_region_is_customer_side(spark, tmp_path):
    """EUROPE customer c1's 1996 order: 200 by NATION_0's supplier, 100
    by NATION_1's -> share floor(2/3 micro) = 0.666666 (round would say
    ...667). ASIA customer c2's giant NATION_0-supplied order must not
    register at all — the region cut is on the CUSTOMER side."""
    _geo(tmp_path)
    _customer(tmp_path, [(1, "c1", 0, 1.0, "BUILDING"), (2, "c2", 1, 1.0, "BUILDING")])
    _supplier(tmp_path, [(1, "S1", 0, 1.0), (2, "S2", 1, 1.0)])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "1996-05-01", "1-URGENT"),
        (2, 2, "F", 1.0, "1996-06-01", "1-URGENT"),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 200.00),
        _li(1, 1, 2, 1.0, 100.00),
        _li(2, 1, 1, 1.0, 99999.00),  # ASIA customer: invisible
    ])
    got = q_tpch_q8_market_share(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.o_year, r.nation_rev, r.total_rev) == (1996, 200.0, 300.0)
    assert r.mkt_share == 0.666666  # floor, NOT round-half-up


def test_q11_strict_threshold_and_europe_only_value(spark, tmp_path):
    """EUROPE part values (cents): 1100, 2000, 500, 700, 700 -> total
    5000, n = 5. Included iff cents*50 > 55000, i.e. cents > 1100: only
    the 2000 part. The 1100 part sits EXACTLY at 110% of the mean ->
    strict > excludes it. The ASIA-supplied 5.00 on that part must not
    lift it to 1600 cents (which would provably admit it: 1600*50 =
    80000 > 11*5500)."""
    _geo(tmp_path)
    _supplier(tmp_path, [(1, "S1", 0, 1.0), (9, "S9", 1, 1.0)])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 11.00),
        _li(2, 1, 9, 1.0, 5.00),    # ASIA supplier: must not count
        _li(3, 2, 1, 1.0, 20.00),
        _li(4, 3, 1, 1.0, 5.00),
        _li(5, 4, 1, 1.0, 7.00),
        _li(6, 5, 1, 1.0, 7.00),
    ])
    got = [(r.l_partkey, r.value)
           for r in q_tpch_q11_important_stock(spark, str(tmp_path)).collect()]
    assert got == [(2, 20.0)]


def test_q13_zero_bucket_and_join_side_priority_filter(spark, tmp_path):
    """c1 has 2 counted orders, c4 has 1 counted + 1 '5-LOW', c2 has ONLY
    a '5-LOW' order, c3 has none: per-customer counts 2/1/0/0 ->
    custdist {2:1, 1:1, 0:2}. Filtering '5-LOW' in a WHERE after the
    left join (instead of in the join condition) would delete c2
    entirely and report 0:1."""
    _customer(tmp_path, [
        (1, "c1", 0, 1.0, "B"), (2, "c2", 0, 1.0, "B"),
        (3, "c3", 0, 1.0, "B"), (4, "c4", 0, 1.0, "B"),
    ])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "1996-01-01", "1-URGENT"),
        (2, 1, "F", 1.0, "1996-01-02", "3-MEDIUM"),
        (3, 2, "F", 1.0, "1996-01-03", "5-LOW"),
        (4, 4, "F", 1.0, "1996-01-04", "2-HIGH"),
        (5, 4, "F", 1.0, "1996-01-05", "5-LOW"),
    ])
    got = {r.c_count: r.custdist
           for r in q_tpch_q13_order_distribution(spark, str(tmp_path)).collect()}
    assert got == {2: 1, 1: 1, 0: 2}


def test_q15_rank_keeps_ties_and_window_half_open(spark, tmp_path):
    """s1 (60+40) and s2 (100) tie at exactly 100.0000 -> BOTH returned
    (rank == 1, not row_number). s3's 999.00 rows sit at 1996-04-01 and
    1995-12-31 — one step outside the half-open quarter — so s3 never
    outranks them."""
    _supplier(tmp_path, [(1, "S1", 0, 1.0), (2, "S2", 0, 1.0), (3, "S3", 0, 1.0)])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 60.00, ship="1996-01-01"),   # left edge inclusive
        _li(2, 1, 1, 1.0, 40.00, ship="1996-03-31"),   # last in-window day
        _li(3, 1, 2, 1.0, 100.00, ship="1996-02-15"),
        _li(4, 1, 3, 1.0, 999.00, ship="1996-04-01"),  # right edge exclusive
        _li(5, 1, 3, 1.0, 999.00, ship="1995-12-31"),  # before the window
    ])
    got = sorted((r.s_suppkey, r.total_revenue)
                 for r in q_tpch_q15_top_supplier(spark, str(tmp_path)).collect())
    assert got == [(1, 100.0), (2, 100.0)]


def test_q17_strict_fifth_of_average_and_part_filter(spark, tmp_path):
    """pk1 (Brand#23, size 10) lines: qty 0.5, 1.0, 7, 7, 7, 7.5 -> sum
    30.00 over 6. Small iff qty*5*6 < 30, i.e. qty < 1: the 0.5 row
    qualifies (ext 123.45), the qty-1.0 row sits EXACTLY at one fifth of
    the average and is excluded. pk2 (wrong brand) and pk3 (size 15, not
    < 15) have qty-0.1 rows that would trivially qualify numerically but
    are filtered out. avg_yearly = round(123.45/7, 6)."""
    _part(tmp_path, [
        (1, "p1", "Brand#23", "T", 10, 1.0),
        (2, "p2", "Brand#99", "T", 10, 1.0),
        (3, "p3", "Brand#23", "T", 15, 1.0),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 0.5, 123.45),
        _li(2, 1, 1, 1.0, 999.00),   # exactly 0.2 * avg: strict < excludes
        _li(3, 1, 1, 7.0, 999.00),
        _li(4, 1, 1, 7.0, 999.00),
        _li(5, 1, 1, 7.0, 999.00),
        _li(6, 1, 1, 7.5, 999.00),
        _li(7, 2, 1, 0.1, 999.00),   # wrong brand
        _li(8, 3, 1, 0.1, 999.00),   # size 15 fails strict < 15
    ])
    got = q_tpch_q17_small_quantity_revenue(spark, str(tmp_path)).collect()[0]
    assert got.n_small == 1
    assert got.total_ext == 123.45
    assert got.avg_yearly == 17.635714  # round(123.45 / 7.0, 6)


def test_q18_having_boundary_is_strict(spark, tmp_path):
    """Order 1 totals exactly 250.00 -> out; order 2 totals 250.01 (via
    100.50 + 149.51 exact cents) -> in, with the joined customer detail."""
    _customer(tmp_path, [(1, "c1", 0, 1.0, "B"), (2, "c2", 0, 1.0, "B")])
    _orders(tmp_path, [
        (1, 1, "F", 111.0, "1996-01-01", "1-URGENT"),
        (2, 2, "F", 222.0, "1996-01-02", "1-URGENT"),
    ])
    _lineitem(tmp_path, [
        _li(1, 1, 1, 100.0, 1.0), _li(1, 1, 1, 150.0, 1.0),
        _li(2, 1, 1, 100.5, 1.0), _li(2, 1, 1, 149.51, 1.0),
    ])
    got = q_tpch_q18_large_volume_customer(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.c_custkey, r.c_name, r.o_orderkey) == (2, "c2", 2)
    assert r.sum_qty == 250.01


def test_q21_sole_late_supplier_on_multi_supplier_f_orders(spark, tmp_path):
    """o1: S1 late, S2 on time -> S1 scores. o2: S1 and S3 both late ->
    mutual lateness cancels both. o3: S1 late but alone on the order ->
    no other supplier, out. o4 has status 'O' -> out despite the late
    line. o5: S6 ships at exactly +60 days (not late, but still the
    'another supplier' witness) while S7 is late -> S7 scores. o6: S8 is
    late on TWO lines with on-time S9 as witness -> numwait counts both
    lines (2). Final order: numwait desc, name asc."""
    _geo(tmp_path)
    _supplier(tmp_path, [(i, f"S{i}", 0, 1.0) for i in range(1, 10)])
    _orders(tmp_path, [
        (1, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (2, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (3, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (4, 1, "O", 1.0, "2024-01-01", "1-URGENT"),
        (5, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
        (6, 1, "F", 1.0, "2024-01-01", "1-URGENT"),
    ])
    late, ontime, exact60 = "2024-03-02", "2024-01-05", "2024-03-01"
    _lineitem(tmp_path, [
        _li(1, 1, 1, 1.0, 1.0, ship=late),
        _li(1, 1, 2, 1.0, 1.0, ship=ontime),
        _li(2, 1, 1, 1.0, 1.0, ship=late),
        _li(2, 1, 3, 1.0, 1.0, ship=late),
        _li(3, 1, 1, 1.0, 1.0, ship=late),
        _li(4, 1, 4, 1.0, 1.0, ship=late),
        _li(4, 1, 5, 1.0, 1.0, ship=ontime),
        _li(5, 1, 6, 1.0, 1.0, ship=exact60),
        _li(5, 1, 7, 1.0, 1.0, ship=late),
        _li(6, 1, 8, 1.0, 1.0, ship=late),
        _li(6, 1, 8, 1.0, 1.0, ship="2024-04-01"),
        _li(6, 1, 9, 1.0, 1.0, ship=ontime),
    ])
    got = [(r.s_name, r.numwait)
           for r in q_tpch_q21_suppliers_who_kept_waiting(spark, str(tmp_path)).collect()]
    assert got == [("S8", 2), ("S1", 1), ("S7", 1)]
