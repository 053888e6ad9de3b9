"""Planted-truth gates for the r11 driver window's two most
formula-heavy entries, plus the two r12-front datasketches entries that
had no dedicated test (r10 VERDICT advice #4: keep spending the
held-registry surplus on evidence depth — the DuckDB oracles bind these
entries to the same formulas the engine uses, so a SHARED misreading
would hash-match; these tests plant inputs whose correct output is
known from first principles, independent of both engines).

* assoc_rules_topk: a ten-basket market with a hand-countable
  support/confidence lattice — pair (1,2) co-occurs in 4 baskets,
  (1,3) in exactly 3 (the min-support boundary, INCLUDED), (2,3) in 1
  (excluded), and part 4 never pairs. Every lift/confidence is a
  floored integer ratio computable by hand, and a duplicate lineitem
  row inside basket 1 pins the DISTINCT-baskets semantics (a bag
  reading would push c1 to 7 and move both confidences).

* events_holt_linear: a sequence where every folded element equals the
  previous state's one-step forecast l+b is a closed-form fixpoint of
  the Holt recursion — with the entry's init convention (l=x0,
  b=x1-x0, fold consumes x2 onward) that sequence is x1 DUPLICATED
  then a constant ramp, and by induction level_t = x_t, trend_t =
  slope (the level update becomes a convex average of x with itself).
  The duplicated element doubles as an off-by-one trap: an
  implementation that folds from x1 instead of x2 diverges from the
  fixpoint immediately. A
  one-event user pins the l=x0/b=0 branch, a two-event user pins the
  init-only l=x0/b=x1-x0 state, and a user with a TIED timestamp pair
  makes the (ts, event_id) tiebreak load-bearing: the reversed order
  provably diverges, so a wrong sort key cannot sneak through.

* agg_bitmap_distinct / agg_approx_topk_merge: hand-countable weekly
  audiences and an at-capacity top-k — including a user_id above the
  32768-bit bucket width (a path no sf-testdata row reaches) and a
  cross-week state combine whose wrong reading is a visible undercount.

* graph_title_link_prediction: a five-node hand graph whose every
  candidate pair's common-neighbor count and floored neighborhood
  Jaccard is derivable on paper, with the hub cap shown to exclude the
  hub from the through-z role ONLY (it keeps its full endpoint degree).

* events_autocorr_daily: a 21-day weekly pulse whose lag-7
  autocorrelation is exactly +1e6 and whose lag-1 integer sufficient
  stats are hand-derived (cov_num = -96, floor rounding the negative
  corr AWAY from zero), plus a constant series pinning the
  NULL-on-zero-variance branch.

* spans_corruption_plan: the md5 mask rule recomputed with hashlib (a
  third implementation) over a 40-doc plant that provably contains both
  an adjacent masked pair (island collapse) and a zero-mask doc (the
  left-join branch), with the T5 input/target identities asserted.

* text_hapax_stats: a hand-counted two-language vocabulary pinning
  case-folding, cross-doc type accumulation, and the all-hapax
  ratio boundary at exactly 1e6.

* orders_benford_digits: prices whose first significant digit must be
  derived from the integer CENTS string (0.01 -> digit 1, 0.05 -> 5),
  a zero-price exclusion, and deviations against the fixed constants.

* privacy_k_anonymity: quasi-classes sitting exactly ON and just BELOW
  the k=5 / l=2 release thresholds, with the 199/200 len-band edge.

* orders_abc_classification: cumulative shares landing EXACTLY on the
  80% and 95% cross-multiplied cuts — both inclusive, so a strict
  reading demotes a part and breaks the class tallies.

* events_retention_triangle: two hand-built weekly cohorts with
  distinct user-week dedup, floored micro retention shares, and an
  event landing exactly on an epoch-week boundary (floor, not round).

* sessionize_events: the 6h inactivity gap is STRICTLY greater-than —
  a gap of exactly 21600 s keeps the session open, 21601 closes it.

* events_topk_movers: an odd day span pinning the FLOOR midpoint split
  (a rounded midpoint visibly corrupts one user's zero delta), with
  day mid itself in the first half and user-id tiebreaks on zeros.

* session_top_paths: hand-built clickstreams pinning the modal path
  count, the path-string tiebreak between equal-count paths, event_id
  serialization of a tied-timestamp pair, and the gap split feeding a
  second one-event path.

* orders_cohort_ltv_triangle: hand-built customers pinning the
  order-vs-distinct-customer counts per cell, a gap year, and exact
  cents accumulation at (cohort_year, age_years) grain.

* seq_rules_brand_topk: purchase histories pinning adjacent-only pair
  formation, the with-successor antecedent denominator (a single-order
  customer contributes nothing), within-order brand dedup, same-date
  sequencing by orderkey, and an exact 1/2 confidence in the ranking.

* profile_orders: a five-row table pinning the profiler's aggregates —
  n_distinct excludes nulls, numeric min/max render through the string
  cast, non-numeric columns carry NULL ranges.
"""

from __future__ import annotations

import pandas as pd


def test_assoc_rules_recover_planted_lattice(spark, tmp_path):
    from movie_data_transformer_spark.operators.analytics_queries import (
        q_assoc_rules_topk,
    )

    # baskets: b1-b3 {1,2}; b4 {1,2,3}; b5,b6 {1,3}; b7,b8 {3};
    # b9,b10 {4}.  item counts c1=6 c2=4 c3=5 c4=2 over N=10 baskets.
    baskets = {
        1: [1, 2, 1],  # duplicate part 1 row: DISTINCT must collapse it
        2: [1, 2],
        3: [1, 2],
        4: [1, 2, 3],
        5: [1, 3],
        6: [1, 3],
        7: [3],
        8: [3],
        9: [4],
        10: [4],
    }
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = q_assoc_rules_topk(spark, str(tmp_path)).collect()
    # qualifying pairs: (1,2) c12=4 and (1,3) c12=3 — the support
    # boundary is inclusive; (2,3) c12=1 and every part-4 pair are out.
    assert [(r.p1, r.p2, r.c12) for r in got] == [(1, 2, 4), (1, 3, 3)]

    r12, r13 = got
    # lift = c12 * N * 1e6 DIV (c1 * c2), floored exact integers:
    # (1,2): 4*10*1e6 // 24 = 1_666_666;  (1,3): 3*10*1e6 // 30 = 1_000_000
    assert r12.lift_micro == 1_666_666
    assert r13.lift_micro == 1_000_000
    # directed confidences, floored: c12*1e6 // c_antecedent
    assert r12.conf_p1_p2_micro == 4_000_000 // 6  # 666_666
    assert r12.conf_p2_p1_micro == 1_000_000
    assert r13.conf_p1_p2_micro == 500_000
    assert r13.conf_p2_p1_micro == 600_000


def _holt_fold(vals):
    """The planted-truth reference fold: pure Python, same IEEE ops in
    the same left-to-right order as both engines' expression trees."""
    if len(vals) == 1:
        return float(vals[0]), 0.0
    level, trend = float(vals[0]), float(vals[1] - vals[0])
    for x in vals[2:]:
        new_level = x * 0.2 + (level + trend) * 0.8
        trend = (new_level - level) * 0.1 + trend * 0.9
        level = new_level
    return level, trend


def test_holt_linear_ramp_fixpoint_and_tiebreak(spark, tmp_path):
    from movie_data_transformer_spark.operators.timeseries_queries import (
        q_events_holt_linear,
    )

    t = [pd.Timestamp(f"2024-05-{d:02d} 08:00:00") for d in range(1, 11)]
    rows = []
    # user 1: the fixpoint sequence 10, 12, 12, 14, 16, ..., 26 — init
    # l=10 b=2, and every folded element equals the prior l+b, so the
    # final state is level=26, trend=2, forecast=28 (exact to <<1e-6
    # in IEEE; a fold that starts one element early diverges at once)
    fix = [10.0, 12.0] + [12.0 + 2.0 * i for i in range(8)]
    for i, v in enumerate(fix):
        rows.append((100 + i, 1, v, t[i]))
    # user 2: single event — level=x0, trend=0 branch
    rows.append((200, 2, 7.0, t[0]))
    # user 3: two events — init-only state l=5, b=4, forecast=9
    rows.append((300, 3, 5.0, t[0]))
    rows.append((301, 3, 9.0, t[1]))
    # user 4: TIED first pair at t[0] — event_id 400 (value 0) must sort
    # before 401 (value 10); the reversed read diverges provably
    rows.append((401, 4, 10.0, t[0]))
    rows.append((400, 4, 0.0, t[0]))
    rows.append((402, 4, 3.0, t[1]))
    pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {r.user_id: r for r in q_events_holt_linear(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].n_events == 10
    assert (got[1].level, got[1].trend, got[1].forecast_1) == (26.0, 2.0, 28.0)
    assert (got[2].level, got[2].trend, got[2].forecast_1) == (7.0, 0.0, 7.0)
    assert (got[3].level, got[3].trend, got[3].forecast_1) == (5.0, 4.0, 9.0)

    # tie order (ts, event_id): [0, 10, 3] — reference fold gives
    # l = 3*0.2 + 10*0.8 = 8.6, b = 0.86 + 9 = 9.86; the reversed
    # order [10, 0, 3] lands at l = 0.6, b = -9.94, so the tiebreak is
    # load-bearing, not decorative.
    lv, tr = _holt_fold([0.0, 10.0, 3.0])
    wrong_lv, wrong_tr = _holt_fold([10.0, 0.0, 3.0])
    assert (round(lv, 6), round(tr, 6)) != (round(wrong_lv, 6), round(wrong_tr, 6))
    assert got[4].level == round(lv, 6) == 8.6
    assert got[4].trend == round(tr, 6) == 9.86
    assert got[4].forecast_1 == round(lv + tr, 6) == 18.46


def test_bitmap_distinct_counts_planted_audience(spark, tmp_path):
    """agg_bitmap_distinct on a hand-countable two-week audience. The
    planted corpus exercises exactly the paths sf-testdata cannot:
    a user_id ABOVE 32768 (the per-bucket bitmap width — sf0.1 tops
    out at user_id 1499, so the multi-bucket sum is otherwise never
    hit), a user whose view events span two DAYS of one week (the
    per-day partial bitmaps must OR-dedup, not add), an event type
    outside {view, purchase} that counts nowhere, and the same user
    re-appearing next week (weekly audiences are independent)."""
    from movie_data_transformer_spark.operators.datasketches_queries import (
        q_agg_bitmap_distinct,
    )

    mon3, tue3, wed3 = (
        pd.Timestamp("2024-01-15 10:00:00"),  # ISO week 3
        pd.Timestamp("2024-01-16 10:00:00"),
        pd.Timestamp("2024-01-17 10:00:00"),
    )
    mon4 = pd.Timestamp("2024-01-22 10:00:00")  # ISO week 4
    rows = [
        # u1: views Mon, purchases Tue -> in BOTH audiences of week 3
        (1, "view", mon3), (1, "purchase", tue3),
        # u2: views Mon AND Wed -> ONE viewer (per-day partials OR-merge)
        (2, "view", mon3), (2, "view", wed3),
        # u3: purchase only
        (3, "purchase", tue3),
        # u32773: view only, lives in bitmap bucket 1 (32773 // 32768)
        (32773, "view", mon3),
        # u4: click only -> in neither audience, nor the union
        (4, "click", mon3),
        # u1 again in week 4: view only there
        (1, "view", mon4),
    ]
    pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {r.wk: r for r in q_agg_bitmap_distinct(spark, str(tmp_path)).collect()}
    assert set(got) == {3, 4}
    wk3 = got[3]
    assert (wk3.n_viewers, wk3.n_purchasers) == (3, 2)  # {1,2,32773}, {1,3}
    assert wk3.n_both == 1  # u1 via inclusion-exclusion, no AND pass
    assert wk3.n_view_only == 2  # u2, u32773
    wk4 = got[4]
    assert (wk4.n_viewers, wk4.n_purchasers, wk4.n_both, wk4.n_view_only) == (
        1, 0, 0, 1,
    )


def test_approx_topk_merge_exact_at_capacity(spark, tmp_path):
    """agg_approx_topk_merge at EXACT capacity: 10 distinct event types
    (k = 10, the no-eviction boundary) with hand-planted counts 1..10,
    the heaviest type split across two ISO weeks so the per-week
    accumulate states must COMBINE-sum (a combine that keeps only one
    week's state reports 6, not 10)."""
    from movie_data_transformer_spark.operators.datasketches_queries import (
        q_agg_approx_topk_merge,
    )

    wk3, wk4 = (
        pd.Timestamp("2024-01-15 10:00:00"),
        pd.Timestamp("2024-01-22 10:00:00"),
    )
    rows = []
    eid = 0
    for i in range(1, 11):  # type_i occurs i times
        for j in range(i):
            eid += 1
            # the count-10 type straddles weeks 6 + 4; all others in wk3
            ts = wk4 if (i == 10 and j >= 6) else wk3
            rows.append((eid, f"type_{i:02d}", ts))
    pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {r.event_type: r.n_events for r in
           q_agg_approx_topk_merge(spark, str(tmp_path)).collect()}
    assert got == {f"type_{i:02d}": i for i in range(1, 11)}


def test_link_prediction_hand_graph_and_hub_cap(spark):
    """predicted_links on a five-node hand graph: z1—{a,b} and
    hub—{a,b,c}. Every candidate's common-neighbor count, degree-based
    union size, and floored neighborhood Jaccard is derivable on paper,
    and the pair (z1, hub) — non-adjacent but sharing {a, b} — pins the
    anti-join non-adjacency. With max_degree=2 the hub is excluded from
    the THROUGH-z role only: pairs through it vanish ((a,b) drops from
    2 common neighbors to 1, (a,c)/(b,c) never form), yet the hub still
    participates as an ENDPOINT with its full degree 3."""
    from movie_data_transformer_spark.operators.linkpred_queries import (
        predicted_links,
    )

    und = [("z1", "a"), ("z1", "b"), ("hub", "a"), ("hub", "b"), ("hub", "c")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in und] + [(d, s) for s, d in und], "src string, dst string"
    )

    def key(df):
        return {
            (r.title_a, r.title_b): (r.n_common, r.nbr_jaccard_micro)
            for r in df.collect()
        }

    full = key(predicted_links(edges))
    # degrees: a=2 b=2 c=1 z1=2 hub=3; union = deg_a + deg_b - n_common
    assert full == {
        ("a", "b"): (2, 1_000_000),      # {z1,hub} / (2+2-2)
        ("hub", "z1"): (2, 666_666),     # {a,b} / (3+2-2), floored
        ("a", "c"): (1, 500_000),        # {hub} / (2+1-1)
        ("b", "c"): (1, 500_000),
    }

    capped = key(predicted_links(edges, max_degree=2))
    assert capped == {
        ("hub", "z1"): (2, 666_666),     # through a AND b, both degree 2
        ("a", "b"): (1, 333_333),        # only through z1; 1/(2+2-1)
    }


def test_autocorr_weekly_pattern_and_zero_variance(spark, tmp_path):
    """events_autocorr_daily on a planted 21-day weekly pulse
    [5,1,1,1,1,1,1] x3: lag-7 aligns the series with itself exactly
    (corr_micro = +1_000_000, cov_num = 384 from integer sufficient
    stats n=14, Sx=Sy=22, Sxy=Sxx=Syy=62), while lag-1's exact bigint
    stats (n=20, Sx=32, Sy=28, Sxy=40, Sxx=92, Syy=68) give
    cov_num = -96 and a negative corr whose floor must round AWAY from
    zero — recomputed here in pure Python with the same IEEE ops as a
    third implementation. A constant series pins the
    NULL-on-zero-variance branch with cov_num exactly 0."""
    import math

    from movie_data_transformer_spark.operators.autocorr_queries import (
        q_events_autocorr_daily,
    )

    rows = []
    pulse = [5, 1, 1, 1, 1, 1, 1] * 3
    for day, c in enumerate(pulse, start=1):
        for _ in range(c):
            rows.append(("weekly", pd.Timestamp(f"2024-03-{day:02d} 12:00:00")))
    for day in range(1, 15):
        for _ in range(2):
            rows.append(("flat", pd.Timestamp(f"2024-03-{day:02d} 12:00:00")))
    pd.DataFrame(rows, columns=["event_type", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {
        (r.event_type, r.lag): r
        for r in q_events_autocorr_daily(spark, str(tmp_path)).collect()
    }
    assert set(got) == {("weekly", 1), ("weekly", 7), ("flat", 1), ("flat", 7)}

    w7 = got[("weekly", 7)]
    assert (w7.n_pairs, w7.cov_num, w7.corr_micro) == (14, 384, 1_000_000)

    w1 = got[("weekly", 1)]
    assert (w1.n_pairs, w1.cov_num) == (20, -96)
    # varx = 20*92 - 32^2 = 816, vary = 20*68 - 28^2 = 576
    expect = math.floor(-96 * 1_000_000 / math.sqrt(816.0 * 576.0))
    assert w1.corr_micro == expect
    assert w1.corr_micro == -140_029  # floor rounds the negative DOWN

    for lag, n in ((1, 13), (7, 7)):
        f = got[("flat", lag)]
        assert (f.n_pairs, f.cov_num, f.corr_micro) == (n, 0, None)


def test_span_corruption_plan_md5_replica(spark, tmp_path):
    """spans_corruption_plan with the mask decisions recomputed in pure
    Python (hashlib md5 over 'doc_id#p' — a THIRD implementation of the
    planted-noise rule, independent of Spark's conv() and DuckDB's hex
    cast), the island collapse re-derived by scanning for consecutive
    masked positions, and the T5 bookkeeping identities asserted
    directly. The plant is only accepted if at least one doc contains
    an adjacent masked pair AND at least one doc has zero masked
    positions, so both the span collapse and the zero-mask left-join
    branch are demonstrably exercised."""
    import hashlib

    from movie_data_transformer_spark.operators.span_corruption_queries import (
        q_spans_corruption_plan,
    )

    n_docs, n_toks = 40, 25
    pd.DataFrame(
        {
            "doc_id": list(range(1, n_docs + 1)),
            "text": ["tok " * n_toks for _ in range(n_docs)],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    def masked_positions(d):
        return [
            p
            for p in range(1, n_toks + 1)
            if int(hashlib.md5(f"{d}#{p}".encode()).hexdigest()[:8], 16) % 1000
            < 150
        ]

    expect = {}
    saw_adjacent = saw_empty = False
    for d in range(1, n_docs + 1):
        pos = masked_positions(d)
        n_masked = len(pos)
        n_spans = sum(1 for i, p in enumerate(pos) if i == 0 or pos[i - 1] != p - 1)
        saw_adjacent |= n_spans < n_masked
        saw_empty |= n_masked == 0
        expect[d] = (
            n_toks,
            n_masked,
            n_spans,
            n_masked * 1_000_000 // n_toks,
            (n_masked * 1_000_000 // n_spans) if n_spans else 0,
            n_toks - n_masked + n_spans,
            n_masked + n_spans,
        )
    assert saw_adjacent, "plant must exercise the island collapse"
    assert saw_empty, "plant must exercise the zero-mask branch"

    got = {
        r.doc_id: (
            r.n_tokens, r.n_masked, r.n_spans, r.mask_rate_micro,
            r.mean_span_len_micro, r.n_input_tokens, r.n_target_tokens,
        )
        for r in q_spans_corruption_plan(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_hapax_stats_hand_counted_vocab(spark, tmp_path):
    """text_hapax_stats on a two-language corpus counted by hand: 'en'
    has 9 tokens over 6 types of which 4 are hapax (case-folding must
    merge 'The'/'the', and the same word in ANOTHER doc of the same
    language still accumulates into one type); 'de' is one doc of three
    distinct words, all hapax (ratio exactly 1e6)."""
    from movie_data_transformer_spark.operators.zipf_queries import (
        q_text_hapax_stats,
    )

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "de"],
            "text": [
                "The cat sat on the mat",   # the x2 (folded), cat sat on mat
                "the cat runs",             # the -> 3, cat -> 2, runs hapax
                "drei neue worte",
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r.lang: r for r in q_text_hapax_stats(spark, str(tmp_path)).collect()}
    en = got["en"]
    # types: the=3 cat=2 sat=1 on=1 mat=1 runs=1 -> vocab 6, 4 singletons
    assert (en.n_tokens, en.vocab_size, en.n_hapax) == (9, 6, 4)
    assert en.hapax_ratio_micro == 4_000_000 // 6  # 666_666
    assert en.ttr_micro == 6_000_000 // 9  # 666_666
    de = got["de"]
    assert (de.n_tokens, de.vocab_size, de.n_hapax) == (3, 3, 3)
    assert (de.hapax_ratio_micro, de.ttr_micro) == (1_000_000, 1_000_000)


def test_benford_digits_derive_from_cents(spark, tmp_path):
    """orders_benford_digits on ten hand-picked prices giving the exact
    digit histogram 1:4 2:3 5:2 9:1 — including 0.01 (1 CENT, first
    digit 1) and 0.05 (5 cents, digit 5), which pin that the first
    significant digit comes from the integer CENTS string, not from the
    decimal rendering of the price (whose first character would be
    '0'). A zero-price order must be excluded by the > 0 filter, and
    the deviation column must equal |obs - benford| against the fixed
    micro constants."""
    from movie_data_transformer_spark.operators.dq_extras_queries import (
        BENFORD_MICRO,
        q_orders_benford_digits,
    )

    prices = [
        1.00, 12.34, 0.01, 199.99,      # cents 100 / 1234 / 1 / 19999 -> 1
        23.00, 2.50, 0.25,              # cents 2300 / 250 / 25 -> 2
        0.05, 55.00,                    # cents 5 / 5500 -> 5
        0.99,                           # cents 99 -> 9
        0.00,                           # excluded by o_totalprice > 0
    ]
    pd.DataFrame(
        {"o_orderkey": range(1, len(prices) + 1), "o_totalprice": prices}
    ).to_parquet(tmp_path / "orders.parquet")

    got = {r.first_digit: r for r in
           q_orders_benford_digits(spark, str(tmp_path)).collect()}
    assert {d: got[d].n_orders for d in got} == {1: 4, 2: 3, 5: 2, 9: 1}
    for d, share in ((1, 400_000), (2, 300_000), (5, 200_000), (9, 100_000)):
        assert got[d].obs_micro == share  # n * 1e6 DIV 10, exact
        assert got[d].benford_micro == BENFORD_MICRO[d]
        assert got[d].dev_micro == abs(share - BENFORD_MICRO[d])


def test_k_anonymity_flags_planted_classes(spark, tmp_path):
    """privacy_k_anonymity on four hand-built quasi-identifier classes
    sitting exactly ON and just BELOW both release thresholds: k = 5
    (at K_MIN: not flagged) vs k = 4 (flagged), l = 2 (at L_MIN: not
    flagged) vs l = 1 (flagged), with n_chars 199/200 pinning the
    len-band edge (199 // 200 = band 0, 200 -> band 1)."""
    from movie_data_transformer_spark.operators.privacy_extras_queries import (
        q_privacy_k_anonymity,
    )

    rows = []
    # class (en, band 0): k=5 from two sources -> passes both gates;
    # n_chars 199 stays in band 0
    for i, src in enumerate(["s1", "s1", "s2", "s2", "s2"]):
        rows.append((len(rows), "en", 100 + i if i < 4 else 199, src))
    # class (en, band 1): k=4 single-source -> below_k AND below_l;
    # n_chars 200 is the first value of band 1
    for i in range(4):
        rows.append((len(rows), "en", 200 + i, "s1"))
    # class (de, band 0): k=5 single-source -> below_l only
    for i in range(5):
        rows.append((len(rows), "de", 50 + i, "s9"))
    pd.DataFrame(
        rows, columns=["doc_id", "lang", "n_chars", "source"]
    ).to_parquet(tmp_path / "documents.parquet")

    got = {(r.lang, r.len_band): r for r in
           q_privacy_k_anonymity(spark, str(tmp_path)).collect()}
    assert set(got) == {("en", 0), ("en", 1), ("de", 0)}
    en0, en1, de0 = got[("en", 0)], got[("en", 1)], got[("de", 0)]
    assert (en0.k, en0.l, en0.below_k, en0.below_l) == (5, 2, 0, 0)
    assert (en1.k, en1.l, en1.below_k, en1.below_l) == (4, 1, 1, 1)
    assert (de0.k, de0.l, de0.below_k, de0.below_l) == (5, 1, 0, 1)


def test_abc_classification_inclusive_cut_boundaries(spark, tmp_path):
    """orders_abc_classification with part revenues 40+40+15+5 = 100
    cents: the second A part lands its cumulative share EXACTLY on the
    80% cut (cum*5 == total*4) and the B part EXACTLY on the 95% cut
    (cum*20 == total*19) — both cross-multiplied comparisons are
    inclusive, so a strict reading demotes a part and shows up as a
    wrong class tally. One part's revenue is split over two lineitem
    rows to pin the per-part cents sum."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_orders_abc_classification,
    )

    rows = [
        (1, 25.00), (1, 15.00),  # p1: 40 cents*100 over TWO rows
        (2, 40.00),              # p2: cum 80 -> exactly the A cut
        (3, 15.00),              # p3: cum 95 -> exactly the B cut
        (4, 5.00),               # p4: C remainder
    ]
    pd.DataFrame(rows, columns=["l_partkey", "l_extendedprice"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = {r.abc_class: (r.n_parts, r.class_rev_cents) for r in
           q_orders_abc_classification(spark, str(tmp_path)).collect()}
    assert got == {"A": (2, 8000), "B": (1, 1500), "C": (1, 500)}


def test_retention_triangle_hand_cohorts(spark, tmp_path):
    """events_retention_triangle on two hand-built weekly cohorts: a
    3-user cohort whose ages 0/1/3 retain 3/2/1 users (floored micro
    shares 1.0 / 0.666666 / 0.333333), a user with TWO events inside
    one week (the distinct user-week pair dedup — n_active counts
    users, not events), and an event landing EXACTLY on an epoch-week
    boundary, which must open the LATER week's cohort (floor division,
    not rounding)."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_events_retention_triangle,
    )

    WEEK = 604800

    def ts(week, off=0):
        return pd.Timestamp((week * WEEK + off), unit="s")

    rows = []
    eid = 0

    def ev(uid, week, off=0):
        nonlocal eid
        eid += 1
        rows.append((eid, uid, ts(week, off)))

    # cohort 2800: u1 active weeks 0/1/3, u2 weeks 0/1, u3 week 0 only
    # (twice in the week -> one distinct pair)
    ev(1, 2800, 100); ev(1, 2801, 100); ev(1, 2803, 100)
    ev(2, 2800, 200); ev(2, 2801, 200)
    ev(3, 2800, 300); ev(3, 2800, 400)
    # cohort 2801: u4's first event sits EXACTLY at the 2801 boundary
    ev(4, 2801, 0); ev(4, 2803, 100)
    pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {(r.cohort_week, r.weeks_since): (r.n_active, r.retention) for r in
           q_events_retention_triangle(spark, str(tmp_path)).collect()}
    assert got == {
        (2800, 0): (3, 1.0),
        (2800, 1): (2, 0.666666),  # 2*1e6 DIV 3, floored, then /1e6
        (2800, 3): (1, 0.333333),
        (2801, 0): (1, 1.0),
        (2801, 2): (1, 1.0),
    }


def test_sessionize_gap_boundary_is_strict(spark, tmp_path):
    """sessionize_events closes a session only when the gap EXCEEDS
    21600 s: a gap of exactly 21600 keeps the session open, 21601
    opens a new one. A second user pins the single-event session and
    the exact decimal-summed value."""
    from movie_data_transformer_spark.operators.temporal_queries import (
        q_sessionize_events,
    )

    base = 1_700_000_000
    rows = [
        # u1: t0, t0+21600 (same session — boundary inclusive),
        # then +21601 more (new session)
        (1, 1, 1.25, pd.Timestamp(base, unit="s")),
        (2, 1, 2.50, pd.Timestamp(base + 21600, unit="s")),
        (3, 1, 4.00, pd.Timestamp(base + 21600 + 21601, unit="s")),
        # u2: lone event
        (4, 2, 7.75, pd.Timestamp(base + 5, unit="s")),
    ]
    pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {(r.user_id, r.session_idx):
           (r.session_start_s, r.session_end_s, r.n_events, r.sum_value)
           for r in q_sessionize_events(spark, str(tmp_path)).collect()}
    assert got == {
        (1, 1): (base, base + 21600, 2, 3.75),
        (1, 2): (base + 43201, base + 43201, 1, 4.0),
        (2, 1): (base + 5, base + 5, 1, 7.75),
    }


def test_topk_movers_floor_midpoint_split(spark, tmp_path):
    """events_topk_movers on four users over an ODD day span 0..3: the
    midpoint is (0+3) DIV 2 = 1 (FLOOR — a rounded midpoint of 2 would
    shift day-2 events into the first half and corrupt u4's zero
    delta), day mid itself belongs to the FIRST half (u2's day-1
    events), and the rank order is abs(delta) descending with the
    user-id tiebreak on the two zero-delta users."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_events_topk_movers,
    )

    def ts(day, off=3600):
        return pd.Timestamp(day * 86400 + off, unit="s")

    rows = []
    eid = 0

    def ev(uid, day, n):
        nonlocal eid
        for k in range(n):
            eid += 1
            rows.append((eid, uid, ts(day, 3600 + k)))

    ev(1, 0, 1); ev(1, 3, 5)   # delta +4
    ev(2, 1, 3)                # day 1 == mid -> h1; delta -3
    ev(3, 0, 2); ev(3, 2, 2)   # delta 0
    ev(4, 0, 1); ev(4, 2, 1)   # delta 0 ONLY under the floor midpoint
    pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = [(r.rk, r.user_id, r.n_h1, r.n_h2, r.delta) for r in
           q_events_topk_movers(spark, str(tmp_path))
           .orderBy("rk").collect()]
    assert got == [
        (1, 1, 1, 5, 4),
        (2, 2, 3, 0, -3),
        (3, 3, 2, 2, 0),   # zero-delta ties break on user_id
        (4, 4, 1, 1, 0),
    ]


def test_session_top_paths_order_and_ties(spark, tmp_path):
    """session_top_paths on hand-built clickstreams: the modal
    three-step path counts 2 sessions; two distinct single-count paths
    tie and must rank by path STRING ('click->view' before
    'view->click'); a tied-timestamp pair inside one session must
    serialize in event_id order; and a >6h gap splits one user's
    stream into two sessions (the second contributes its own
    one-event path)."""
    from movie_data_transformer_spark.operators.interval_queries import (
        q_session_top_paths,
    )

    base = 1_700_000_000
    rows = [
        # u1 session 1: view -> click -> purchase; then a >GAP_S break
        # and a lone 'view' session
        (1, 1, "view", base), (2, 1, "click", base + 10),
        (3, 1, "purchase", base + 20),
        (4, 1, "view", base + 20 + 21601),
        # u2: same modal path, with the click/purchase pair TIED on ts —
        # event_id 6 (click) must precede 7 (purchase)
        (5, 2, "view", base), (7, 2, "purchase", base + 10),
        (6, 2, "click", base + 10),
        # u3 / u4: the tying single-count paths
        (8, 3, "view", base), (9, 3, "click", base + 5),
        (10, 4, "click", base), (11, 4, "view", base + 5),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    df.to_parquet(tmp_path / "events.parquet")

    got = [(r.rk, r.path, r.n_sessions) for r in
           q_session_top_paths(spark, str(tmp_path)).orderBy("rk").collect()]
    assert got == [
        (1, "view->click->purchase", 2),
        (2, "click->view", 1),   # string tiebreak: 'c' < 'v'
        (3, "view", 1),          # u1's post-gap second session
        (4, "view->click", 1),
    ]


def test_ltv_triangle_hand_cohorts(spark, tmp_path):
    """orders_cohort_ltv_triangle on three hand-built customers: a 2020
    cohort member with TWO first-year orders (n_orders counts orders,
    n_active counts distinct customers), a gap year (age 1 exists only
    through the second customer), and exact cents accumulation per
    (cohort_year, age_years) cell."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_orders_cohort_ltv_triangle,
    )

    rows = [
        # cust 1, cohort 2020: two orders in 2020, one in 2022
        (1, 1, 100.00, pd.Timestamp("2020-03-01")),
        (2, 1, 50.00, pd.Timestamp("2020-09-15")),
        (3, 1, 25.00, pd.Timestamp("2022-01-05")),
        # cust 2, cohort 2021
        (4, 2, 10.00, pd.Timestamp("2021-06-01")),
        # cust 3, cohort 2020: ages 0 and 1
        (5, 3, 1.00, pd.Timestamp("2020-12-31")),
        (6, 3, 2.00, pd.Timestamp("2021-01-01")),
    ]
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).to_parquet(
        # micro-second timestamps: only the events reader handles NANOS
        tmp_path / "orders.parquet", coerce_timestamps="us",
    )

    got = {(r.cohort_year, r.age_years): (r.n_orders, r.n_active, r.rev_cents)
           for r in q_orders_cohort_ltv_triangle(spark, str(tmp_path)).collect()}
    assert got == {
        (2020, 0): (3, 2, 15_100),
        (2020, 1): (1, 1, 200),
        (2020, 2): (1, 1, 2_500),
        (2021, 0): (1, 1, 1_000),
    }


def test_seq_rules_adjacent_order_semantics(spark, tmp_path):
    """seq_rules_brand_topk on four hand-built purchase histories
    pinning: ADJACENT-only pair formation (a customer's 1st and 3rd
    orders never pair), the antecedent denominator = brand occurrences
    in orders WITH a successor (a single-order customer contributes
    nothing anywhere), within-order brand dedup (two same-brand parts
    in one order count once), same-date order sequencing by orderkey,
    and the (confidence, support, brand) rank order with an exact
    1/2 confidence."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_seq_rules_brand_topk,
    )

    parts = [(10, "A"), (11, "A"), (20, "B"), (30, "C")]
    pd.DataFrame(parts, columns=["p_partkey", "p_brand"]).to_parquet(
        tmp_path / "part.parquet"
    )
    orders = [
        # cust 1: A -> B -> {A, C}  (order 3 has TWO brand-A parts)
        (1, 1, pd.Timestamp("2024-01-01")),
        (2, 1, pd.Timestamp("2024-01-05")),
        (3, 1, pd.Timestamp("2024-01-09")),
        # cust 2: A -> B -> C
        (4, 2, pd.Timestamp("2024-02-01")),
        (5, 2, pd.Timestamp("2024-02-02")),
        (9, 2, pd.Timestamp("2024-02-03")),
        # cust 3: single order -> contributes NOTHING
        (6, 3, pd.Timestamp("2024-03-01")),
        # cust 4: two orders on the SAME date -> sequence by orderkey
        (7, 4, pd.Timestamp("2024-04-01")),   # {C} first (key 7 < 8)
        (8, 4, pd.Timestamp("2024-04-01")),   # {A} second
    ]
    pd.DataFrame(
        orders, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_parquet(tmp_path / "orders.parquet", coerce_timestamps="us")
    li = [
        (1, 10), (2, 20), (3, 10), (3, 11), (3, 30),
        (4, 10), (5, 20), (9, 30),
        (6, 20), (6, 30),
        (7, 30), (8, 10),
    ]
    pd.DataFrame(li, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )

    got = [(r.rk, r.brand_a, r.brand_b, r.support, r.confidence) for r in
           q_seq_rules_brand_topk(spark, str(tmp_path)).orderBy("rk").collect()]
    # pairs: A->B support 2 (c1, c2); B->A 1 (c1); B->C 2 (c1: B->{A,C}
    # contributes B->C too? no — c1's adjacent steps are 1->2 (A->B) and
    # 2->3 (B->A and B->C); c2's are A->B and B->C) => B->C support 2;
    # C->A 1 (c4). antecedents: A=2 (c1 rn1, c2 rn1), B=2 (c1 rn2, c2
    # rn2), C=1 (c4 rn1). confidences: A->B 1.0, B->C 1.0, C->A 1.0,
    # B->A 0.5.
    assert got == [
        (1, "A", "B", 2, 1.0),
        (2, "B", "C", 2, 1.0),
        (3, "C", "A", 1, 1.0),
        (4, "B", "A", 1, 0.5),
    ]


def test_profile_orders_null_and_distinct_semantics(spark, tmp_path):
    """profile_orders on a five-row hand-built table pinning the
    profiler's aggregate semantics: n_distinct EXCLUDES nulls
    (countDistinct of [7,7,7,NULL,NULL] is 1, not 2), numeric min/max
    render through the string cast ('1.5'/'10.25', and an Int64 key
    column stays integer-rendered), non-numeric columns carry NULL
    min/max, and every report row shares the same n_rows."""
    from movie_data_transformer_spark.operators.profile_queries import (
        q_profile_orders,
    )

    d1, d2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-02-01")
    df = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2, 3, 4, 5], dtype="Int64"),
            "o_custkey": pd.array([7, 7, 7, None, None], dtype="Int64"),
            "o_orderstatus": ["O", "F", "O", None, "P"],
            "o_totalprice": [1.5, 10.25, 1.5, 2.0, 3.0],
            "o_orderdate": [d1, d1, d2, pd.NaT, d2],
            "o_orderpriority": ["1-URGENT", None, None, None, None],
        }
    )
    df.to_parquet(tmp_path / "orders.parquet", coerce_timestamps="us")

    got = {r["column"]: (r.n_rows, r.n_nulls, r.n_distinct, r.min_val, r.max_val)
           for r in q_profile_orders(spark, str(tmp_path)).collect()}
    assert got["o_orderkey"] == (5, 0, 5, "1", "5")
    assert got["o_custkey"] == (5, 2, 1, "7", "7")  # nulls out of distinct
    assert got["o_orderstatus"] == (5, 1, 3, None, None)
    assert got["o_totalprice"] == (5, 0, 4, "1.5", "10.25")
    assert got["o_orderdate"] == (5, 1, 2, None, None)
    assert got["o_orderpriority"] == (5, 4, 1, None, None)
