"""Planted-truth gates, function-pack batch 2 (r13 window; see
test_r13_planted_packs.py). Corners pinned here:

- expr_try_pack: try_add survives EXACTLY int64 max (orderkey 7 + the
  2^63-8 literal) and NULLs one past it; try_divide NULLs only the
  %3 == 0 keys; try_cast NULLs '1-URGENT' but parses a purely numeric
  priority; try_element_at(…, 5) is 1-indexed (the 5th dash part).
- agg_ansi_pack: deterministic mode picks the SMALLEST tied hour;
  median interpolates an even count; count_if/bool_or are strict at
  their literals (50 and 300 don't count, 50.01 and 300.5 do);
  bool_and fails on a single zero (value > 0 strict).
- map_functions: absent statuses coalesce to 0 and n_statuses counts
  only present keys.
- array_functions: the embedding column is FLOAT32 — a nominal 0.3
  widens to 0.30000001…, which is STRICTLY GREATER than the 0.3 double
  literal, so has_big fires on a vector whose printed values say it
  shouldn't; all other planted components are dyadic (exact in both
  widths). head8_sum slices exactly 8, n_pos is strict > 0,
  element_at is 1-indexed.
- url_functions_pack: parse_url inverts the construction and
  url_encode on [a-z0-9 ] text is exactly space->'+'.
- union_by_name_evolution: legacy rows land in the NULL-priority group
  with cents summed exactly; the 1997-01-01 boundary order belongs to
  the NEW side (>=).
- df_transpose: the index column's values become columns, a
  zero-customer region reports 0 (left join), and both metric rows
  carry the per-region values.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from movie_data_transformer_spark.operators.function_packs import (
    q_agg_ansi_pack,
    q_array_functions,
    q_df_transpose,
    q_expr_try_pack,
    q_map_functions,
    q_union_by_name_evolution,
    q_url_functions_pack,
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


def test_try_pack_overflow_boundary_and_null_sites(spark, tmp_path):
    """orderkey 7 + 9223372036854775800 == int64 max exactly (kept);
    orderkey 8 overflows (NULL). custkey 3 divides by zero (NULL);
    custkey 1 passes totalprice through. Priority '42' parses; the 5th
    dash-part of 'a-b-c-d-e-f' is 'e' (1-indexed)."""
    _orders(tmp_path, [
        (7, 1, "F", 64.0, "1996-01-01", "1-URGENT"),
        (8, 3, "F", 10.0, "1996-01-01", "42"),
        (9, 2, "F", 9.0, "1996-01-01", "a-b-c-d-e-f"),
    ])
    got = {r.o_orderkey: r for r in q_expr_try_pack(spark, str(tmp_path)).collect()}
    assert got[7].add_guard == 9223372036854775807  # exactly max: no overflow
    assert got[8].add_guard is None                 # one past: NULL
    assert got[7].div_val == 64.0 and got[7].pri_int is None and got[7].pri_digit == 1
    assert got[8].div_val is None                   # custkey % 3 == 0
    assert got[8].pri_int == 42 and got[8].pri_digit == 4
    assert got[9].div_val == 4.5                    # 9.0 / (2 % 3)
    assert got[9].elem5 == "e"                      # 1-indexed 5th part
    assert got[7].elem5 is None and got[8].elem5 is None


def test_ansi_pack_mode_tiebreak_median_and_strict_bounds(spark, tmp_path):
    """Type A: hours {1: x2, 3: x2} -> deterministic mode picks 1;
    median of {1,2,3,10} interpolates to 2.5. Type B: value 50 does not
    count toward n_high (strict >) but 50.01 does; 300 does not trip
    any_extreme but 300.5 does; the 0 value kills all_positive; median
    of 5 values is the middle one (50.01); hours tie {0,2} -> 0."""
    _events(tmp_path, [
        (1, "2024-01-01 01:00", 1, "A", 1.0, "{}"),
        (2, "2024-01-01 01:30", 1, "A", 2.0, "{}"),
        (3, "2024-01-01 03:00", 1, "A", 3.0, "{}"),
        (4, "2024-01-01 03:30", 1, "A", 10.0, "{}"),
        (5, "2024-01-01 00:10", 1, "B", 50.0, "{}"),
        (6, "2024-01-01 00:20", 1, "B", 50.01, "{}"),
        (7, "2024-01-01 02:10", 1, "B", 300.0, "{}"),
        (8, "2024-01-01 02:20", 1, "B", 300.5, "{}"),
        (9, "2024-01-01 07:00", 1, "B", 0.0, "{}"),
    ])
    got = {r.event_type: r for r in q_agg_ansi_pack(spark, str(tmp_path)).collect()}
    a, b = got["A"], got["B"]
    assert (a.n, a.n_high, a.all_positive, a.any_extreme) == (4, 0, True, False)
    assert a.med_value == 2.5 and a.mode_hour == 1
    assert (b.n, b.n_high, b.all_positive, b.any_extreme) == (5, 3, False, True)
    assert b.med_value == 50.01 and b.mode_hour == 0


def test_map_functions_coalesce_absent_statuses(spark, tmp_path):
    _orders(tmp_path, [
        (1, 1, "O", 1.0, "1996-01-01", "x"),
        (2, 1, "O", 1.0, "1996-01-02", "x"),
        (3, 1, "F", 1.0, "1996-01-03", "x"),
        (4, 2, "P", 1.0, "1996-01-04", "x"),
    ])
    got = {r.o_custkey: r for r in q_map_functions(spark, str(tmp_path)).collect()}
    assert (got[1].n_open, got[1].n_filled, got[1].n_pending, got[1].n_statuses) == (2, 1, 0, 2)
    assert (got[2].n_open, got[2].n_filled, got[2].n_pending, got[2].n_statuses) == (0, 0, 1, 1)


def _embeddings(tmp_path, vecs):
    tbl = pa.table({
        "vec_id": pa.array(range(1, len(vecs) + 1), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")


def test_array_functions_float32_widening_and_slices(spark, tmp_path):
    """vec 1 is all dyadic (exact in float32 and double): vsum 3.25,
    head8_sum 1.75, n_pos 8, first_dim 0.25, max 2.0 / min -1.0,
    has_big via 0.5. vec 2's only candidate is a nominal 0.3 — stored
    float32 it widens to 0.30000001…, strictly ABOVE the 0.3 double
    literal, so has_big is 1 even though vsum rounds back to 0.3. vec 3
    (all 0.25 and a zero) has no candidate and n_pos excludes the
    exact zero."""
    _embeddings(tmp_path, [
        [0.25, -0.75, 0.5, 0.0, 1.0, 0.25, 0.25, 0.25, 2.0, -1.0, 0.0, 0.5],
        [0.3, 0.25, 0.0, -0.25],
        [0.25, 0.25, 0.0],
    ])
    got = {r.vec_id: r for r in q_array_functions(spark, str(tmp_path)).collect()}
    v1 = got[1]
    assert (v1.dim, v1.vsum, v1.vmax, v1.vmin) == (12, 3.25, 2.0, -1.0)
    assert (v1.n_pos, v1.first_dim, v1.head8_sum, v1.has_big) == (8, 0.25, 1.75, 1)
    v2 = got[2]
    assert v2.vsum == 0.3          # round-6 hides the widening...
    assert v2.has_big == 1         # ...but the strict compare exposes it
    v3 = got[3]
    assert (v3.n_pos, v3.has_big) == (2, 0)


def test_url_pack_inverts_construction(spark, tmp_path):
    pd.DataFrame({
        "doc_id": [1],
        "text": ["hello world 42"],
        "lang": ["en"],
        "source": ["web"],
        "n_chars": [14],
    }).to_parquet(tmp_path / "documents.parquet")
    r = q_url_functions_pack(spark, str(tmp_path)).collect()[0]
    assert (r.proto, r.host, r.path) == ("https", "web.example.com", "/docs/1")
    assert r.qlang == "en"
    assert r.q_enc == "hello+world+42"
    assert r.roundtrip_ok == 1


def test_union_by_name_backfills_legacy_null_group(spark, tmp_path):
    """1996 orders (10.00 and 0.01) form the NULL-priority legacy group
    with exactly 1001 cents; the order dated exactly 1997-01-01 belongs
    to the NEW side (>= boundary) under '1-URGENT'."""
    _orders(tmp_path, [
        (1, 1, "F", 10.00, "1996-06-01", "1-URGENT"),
        (2, 1, "F", 0.01, "1996-12-31", "2-HIGH"),
        (3, 1, "F", 5.00, "1997-01-01", "1-URGENT"),
    ])
    got = {r.o_orderpriority: (r.n_orders, r.sum_price_cents)
           for r in q_union_by_name_evolution(spark, str(tmp_path)).collect()}
    assert got == {None: (2, 1001), "1-URGENT": (1, 500)}


def test_df_transpose_regions_become_columns(spark, tmp_path):
    """AFRICA: nations 0 and 1 -> 2 nations, customers 1 and 2 -> 2;
    ASIA: 1/1; AMERICA (nation 5), EUROPE, MIDDLE EAST: one nation each
    but zero customers (the left join must report 0, not drop them)."""
    pd.DataFrame({
        "r_regionkey": [0, 1, 2, 3, 4],
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }).to_parquet(tmp_path / "region.parquet")
    pd.DataFrame({
        "n_nationkey": [0, 1, 2, 3, 4, 5],
        "n_name": [f"N{i}" for i in range(6)],
        "n_regionkey": [0, 0, 2, 3, 4, 1],
    }).to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["a", "b", "c"],
        "c_nationkey": [0, 1, 2],
        "c_acctbal": [1.0, 1.0, 1.0],
        "c_mktsegment": ["B", "B", "B"],
    }).to_parquet(tmp_path / "customer.parquet")
    rows = [r.asDict() for r in q_df_transpose(spark, str(tmp_path)).collect()]
    key_field = [k for k in rows[0] if k not in
                 ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")][0]
    got = {r[key_field]: r for r in rows}
    nat, cust = got["n_nations"], got["n_customers"]
    assert [nat[c] for c in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")] \
        == [2, 1, 1, 1, 1]
    assert [cust[c] for c in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")] \
        == [2, 0, 1, 0, 0]
