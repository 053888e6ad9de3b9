"""Planted-truth gates for the round-8 statistics families (r9 VERDICT
advice #3: keep deepening evidence instead of widening the registry —
the DuckDB oracles bind these entries to the same formulas the engine
uses, so a SHARED misreading would hash-match; these tests plant inputs
whose correct output is known from first principles, independent of
both engines).

* KS two-sample: two uniform grids shifted by half their width have the
  closed-form statistic D = 1/2 (the |c1-c2| plateau is exactly 50 over
  values 50..100), and two identical grids have D = 0 — the exact
  bigint numerator pipeline must land on both, which no cumulative-count
  bookkeeping identity can fake.
* isotonic PAVA: hand-poolable violator sequences — the classic
  single-violator pool, the fully-decreasing total pool, an
  unequal-weight pair whose pooled value differs from the unweighted
  mean (catches weight bugs), and a monotone input that must pass
  through untouched. The minimax formula must reproduce the known PAVA
  blocks exactly in floored micro units.
* Markov typicality: a planted 2-state chain over four users whose
  global transition matrix is computable by hand (p(A->A) = 4/6,
  p(A->B) = 2/6, p(B->A) = 1), including one user whose two events
  share a timestamp so the (ts, event_id) tiebreak is load-bearing: the
  wrong tie order flips that user's transitions to A->B, B->A and moves
  EVERY user's typicality through the changed matrix.
"""

from __future__ import annotations

import pandas as pd


def test_ks_recovers_planted_shift(spark, tmp_path):
    """en = one doc per n_chars 1..100, de = one per 51..150: the
    cumulative gap |c1 - c2| is x for x <= 50 and exactly 50 for
    50 <= x <= 100, so D = 50/100 with numerator 50 * 100 = 5000."""
    from movie_data_transformer_spark.operators.ks_queries import (
        q_stats_ks_two_sample,
    )

    d = tmp_path / "shift"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": list(range(200)),
            "lang": ["en"] * 100 + ["de"] * 100,
            "n_chars": list(range(1, 101)) + list(range(51, 151)),
        }
    ).to_parquet(d / "documents.parquet")

    row = q_stats_ks_two_sample(spark, str(d)).collect()[0]
    assert (row.n1, row.n2) == (100, 100)
    assert row.d_num == 5000  # 50 * n2, exact bigint
    assert row.d_micro == 500_000  # D = 1/2 exactly


def test_ks_identical_samples_give_zero(spark, tmp_path):
    """Identical grids: c1 == c2 at every observed value, D = 0."""
    from movie_data_transformer_spark.operators.ks_queries import (
        q_stats_ks_two_sample,
    )

    d = tmp_path / "same"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": list(range(200)),
            "lang": ["en"] * 100 + ["de"] * 100,
            "n_chars": list(range(1, 101)) * 2,
        }
    ).to_parquet(d / "documents.parquet")

    row = q_stats_ks_two_sample(spark, str(d)).collect()[0]
    assert (row.n1, row.n2) == (100, 100)
    assert row.d_num == 0
    assert row.d_micro == 0


def _iso(spark, rows):
    from movie_data_transformer_spark.operators.isotonic_queries import (
        isotonic_fit_bins,
    )

    bins = spark.createDataFrame(rows, "bin int, n long, n_pos long")
    got = isotonic_fit_bins(bins).collect()
    return {r.bin: r for r in got}


def test_isotonic_pools_single_violator(spark):
    """Rates .1 .3 .2 .4: PAVA pools exactly bins 2-3 to their average
    .25; the flanks are untouched."""
    got = _iso(spark, [(1, 10, 1), (2, 10, 3), (3, 10, 2), (4, 10, 4)])
    assert [got[b].rate_micro for b in (1, 2, 3, 4)] == [
        100_000, 300_000, 200_000, 400_000,
    ]
    assert [got[b].iso_rate_micro for b in (1, 2, 3, 4)] == [
        100_000, 250_000, 250_000, 400_000,
    ]


def test_isotonic_full_decrease_pools_everything(spark):
    """Strictly decreasing rates .5 .4 .3 .2 pool into ONE block at the
    grand mean 14/40 = .35 — every bin gets 350000."""
    got = _iso(spark, [(1, 10, 5), (2, 10, 4), (3, 10, 3), (4, 10, 2)])
    assert all(got[b].iso_rate_micro == 350_000 for b in (1, 2, 3, 4))


def test_isotonic_pool_is_weighted(spark):
    """Unequal-weight violator pair (n=10 rate .6, n=30 rate .3): the
    pooled value is the WEIGHTED average 15/40 = .375, not the
    unweighted .45 — a weight bug is a 75000-micro miss."""
    got = _iso(spark, [(1, 10, 6), (2, 30, 9)])
    assert got[1].rate_micro == 600_000 and got[2].rate_micro == 300_000
    assert got[1].iso_rate_micro == 375_000
    assert got[2].iso_rate_micro == 375_000


def test_isotonic_monotone_input_is_identity(spark):
    """Already-monotone input must pass through bin-for-bin unchanged."""
    got = _iso(spark, [(1, 10, 1), (2, 10, 2), (3, 10, 3)])
    for b in (1, 2, 3):
        assert got[b].iso_rate_micro == got[b].rate_micro


def test_markov_typicality_recovers_planted_chain(spark, tmp_path):
    """Four users over states {A, B}; global matrix by construction:
    A->A 4 of 6 from A (666666 micro), A->B 2 of 6 (333333), B->A 1 of 1
    (1000000). User 4's second and third events share a timestamp and
    only the event_id tiebreak orders them A before B — the wrong order
    would plant a B->A transition that shifts p(A->A) to 3/5 = 600000
    and moves user 1's typicality, so the assertion set pins the
    ordering rule, the matrix, and the per-user DIV in one shot."""
    from movie_data_transformer_spark.operators.markov_queries import (
        q_events_markov_user_typicality,
    )

    t0, t1, t2 = (
        pd.Timestamp("2024-01-01 00:00:00"),
        pd.Timestamp("2024-01-01 00:00:01"),
        pd.Timestamp("2024-01-01 00:00:02"),
    )
    rows = [
        # user 1: A A A -> A->A x2
        (1, 1, "A", t0), (2, 1, "A", t1), (3, 1, "A", t2),
        # user 2: A B -> A->B
        (4, 2, "A", t0), (5, 2, "B", t1),
        # user 3: B A A -> B->A, A->A
        (6, 3, "B", t0), (7, 3, "A", t1), (8, 3, "A", t2),
        # user 4: A then a TIED pair at t1 — event_id 10 (A) before 11
        # (B) -> A->A, A->B
        (9, 4, "A", t0), (11, 4, "B", t1), (10, 4, "A", t1),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {
        r.user_id: r
        for r in q_events_markov_user_typicality(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].n_transitions, got[1].typicality_micro) == (2, 666_666)
    assert (got[2].n_transitions, got[2].typicality_micro) == (1, 333_333)
    # (1000000 + 666666) DIV 2
    assert (got[3].n_transitions, got[3].typicality_micro) == (2, 833_333)
    # (666666 + 333333) DIV 2 — truncating division, not rounding
    assert (got[4].n_transitions, got[4].typicality_micro) == (2, 499_999)


def test_kendall_counts_planted_pairs(spark, tmp_path):
    """Five planted days whose (quantity, price) ranks give exactly 8
    concordant, 1 discordant, and 1 tied pair of the 10 — including one
    day built from TWO lineitem rows so the day-grain truncating average
    (sum DIV count) is load-bearing, and one price tie that must count
    as neither concordant nor discordant."""
    from movie_data_transformer_spark.operators.kendall_queries import (
        q_stats_kendall_by_year,
    )

    rows = [
        # day 1 from TWO rows: qa = (50+150) DIV 2 = 100, pa likewise
        ("1995-03-01", 0.5, 0.5), ("1995-03-01", 1.5, 1.5),
        ("1995-03-02", 2.0, 3.0),
        ("1995-03-03", 3.0, 2.0),
        ("1995-03-04", 4.0, 4.0),
        ("1995-03-05", 5.0, 4.0),  # price TIES with day 4
    ]
    # l_shipdate must be parquet DATE (the real table's type) — a raw
    # pandas datetime64[ns] column round-trips as TIMESTAMP(NANOS),
    # which Spark surfaces as bigint under the session's nanos conf
    pd.DataFrame(
        rows, columns=["l_shipdate", "l_quantity", "l_extendedprice"]
    ).assign(
        l_shipdate=lambda d: pd.to_datetime(d.l_shipdate).dt.date
    ).to_parquet(tmp_path / "lineitem.parquet")

    row = q_stats_kendall_by_year(spark, str(tmp_path)).collect()[0]
    # pairs (1,2)(1,3)(1,4)(2,4)(1,5)(2,5)(3,5)(3,4) concordant... by
    # hand: C = 8, D = 1 (days 2-3 swap), T = 1 (days 4-5 price tie)
    assert row.y == 1995
    assert (row.concordant, row.discordant, row.tied) == (8, 1, 1)
    assert row.tau_a_micro == (8 - 1) * 1_000_000 // 10  # 700000


def test_throttle_keeps_greedy_chain_not_lag_gaps(spark):
    """Events at +0, +1d, +3d, +5d, +6d, +7d with TTL = 3 days: the
    greedy kept-chain is {0, 3d, 6d}. A lag-since-previous-EVENT
    implementation would suppress the +3d event (2d since the +1d one)
    and a session-window would extend on suppressed events — both
    produce a different kept set, so this chain separates the three
    semantics. A same-timestamp pair pins the event_id tiebreak."""
    from movie_data_transformer_spark.operators.throttle_queries import (
        throttle_ttl,
    )

    day = 86_400 * 1_000_000
    rows = [
        (1, "mail", 0 * day, 10),
        (1, "mail", 1 * day, 11),
        (1, "mail", 3 * day, 12),
        (1, "mail", 5 * day, 13),
        (1, "mail", 6 * day, 14),
        (1, "mail", 7 * day, 15),
        # tied timestamps: id 20 is kept, id 21 suppressed (0 < TTL)
        (2, "mail", 0, 21),
        (2, "mail", 0, 20),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, event_id long"
    )
    kept = {
        (r.user_id, r.kept_event_id) for r in throttle_ttl(ev).collect()
    }
    assert kept == {(1, 10), (1, 12), (1, 14), (2, 20)}


def test_hysteresis_holds_state_through_dead_band(spark, tmp_path):
    """Ten planted days with counts a permutation of 1..10, so the p80 /
    p40 rank watermarks are exactly 8 and 4. Chronological counts
    4 9 5 1 10 6 2 7 3 8 classify neutral/on/neutral/off/on/neutral/
    off/neutral/off/neutral — the two neutral days AFTER an 'on' day
    (counts 5 and 6) must HOLD the alert through the dead band, so the
    run emits exactly 4 transitions; a plain threshold (no hysteresis)
    would emit 8."""
    from movie_data_transformer_spark.operators.alerting_queries import (
        q_events_hysteresis_alerts,
    )

    counts = [4, 9, 5, 1, 10, 6, 2, 7, 3, 8]
    rows = []
    eid = 0
    for d, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "view", pd.Timestamp(f"2024-02-{d:02d} 12:00:00")))
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    got = sorted(
        (str(r.day), r.n, r.transition)
        for r in q_events_hysteresis_alerts(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("2024-02-02", 9, "alert_started"),
        ("2024-02-04", 1, "alert_ended"),
        ("2024-02-05", 10, "alert_started"),
        ("2024-02-07", 2, "alert_ended"),
    ]


def test_fellegi_sunter_scores_planted_confusion(spark, tmp_path):
    """Four planted parts whose perturbation classes, levenshtein
    distances, and blocking bands are all chosen by hand: two identical
    twins score 8700 (match, true), the first-word-dropped twin scores
    3200 (possible, true), a same-name different-key doppelganger scores
    7000 (match, FALSE — the model's inherent false positive), and the
    size-bumped twin crosses a div-8 band boundary so its true pair is
    blocked out entirely (the documented blocking-recall cost: only 2
    true matches survive, not 3)."""
    from movie_data_transformer_spark.operators.linkage_queries import (
        q_er_fellegi_sunter,
    )

    parts = [
        # (%3 == 0) identical twins
        (3, "red bolt", "B1", 10),
        (6, "blu bolt", "B2", 10),
        # (%3 == 1) drops "ab " -> "bolt", levenshtein 3 -> fuzzy band
        (4, "ab bolt", "B1", 10),
        # (%3 == 2) size 15 -> 16 crosses the div-8 band: true pair lost;
        # its A record still pairs with key 3's B twin name-exactly
        (5, "red bolt", "B1", 15),
    ]
    pd.DataFrame(
        parts, columns=["p_partkey", "p_name", "p_brand", "p_size"]
    ).to_parquet(tmp_path / "part.parquet")

    got = {
        (r["class"], r.is_true_match): (r.n_pairs, r.min_score_milli, r.max_score_milli)
        for r in q_er_fellegi_sunter(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("match", True): (2, 8700, 8700),  # 6500 + 1200 + 1000
        ("match", False): (1, 7000, 7000),  # exact-name doppelganger
        ("possible", True): (1, 3200, 3200),  # fuzzy + brand + size
        ("possible", False): (7, 1200, 3200),
        ("non_match", False): (1, -500, -500),  # fuzzy - brand - size
    }
    assert sum(v[0] for v in got.values()) == 12  # 4x3 within-band pairs


def test_winsorize_clips_planted_tails(spark, tmp_path):
    """200 orders priced 1..200 dollars: the p1/p99 rank picks are
    exactly rank 2 (200 cents) and rank 198 (19800 cents), so exactly
    one order clips low and two clip high, and the winsorized sum
    moves by +100 - 100 - 200 cents — every output field is
    hand-computable."""
    from movie_data_transformer_spark.operators.robust_stats_queries import (
        q_orders_winsorize,
    )

    pd.DataFrame(
        {
            "o_orderkey": list(range(1, 201)),
            "o_totalprice": [float(i) for i in range(1, 201)],
        }
    ).to_parquet(tmp_path / "orders.parquet")

    row = q_orders_winsorize(spark, str(tmp_path)).collect()[0]
    assert (row.n, row.lo_cents, row.hi_cents) == (200, 200, 19_800)
    assert row.sum_cents_raw == 200 * 201 // 2 * 100  # 2_010_000
    assert row.sum_cents_winsorized == 2_010_000 + 100 - 100 - 200
    assert (row.n_clipped_low, row.n_clipped_high) == (1, 2)


def _md5_32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_weighted_priority_matches_python_recompute(spark, tmp_path):
    """Ten planted docs: every rational priority n_chars * 2^32 DIV
    (bucket + 1) is recomputed in pure Python (the THIRD md5
    implementation, independent of both Spark's conv() and DuckDB's
    hex-cast route), and the rank order including the desc/doc_id
    tiebreak must match the Python sort exactly."""
    from movie_data_transformer_spark.operators.sampling_queries import (
        q_sample_weighted_priority,
    )

    n_chars = {i: 100 * i for i in range(1, 11)}
    pd.DataFrame(
        {
            "doc_id": list(n_chars),
            "lang": ["en"] * 10,
            "n_chars": [n_chars[i] for i in n_chars],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    expected_pri = {
        i: n_chars[i] * 4294967296 // ((_md5_32(str(i)) % 1_000_000) + 1)
        for i in n_chars
    }
    order = sorted(expected_pri, key=lambda i: (-expected_pri[i], i))

    got = {r.doc_id: r for r in q_sample_weighted_priority(spark, str(tmp_path)).collect()}
    assert set(got) == set(n_chars)  # all 10 inside the top-200 cap
    for i in n_chars:
        assert got[i].priority == expected_pri[i], i
    assert [i for i in sorted(got, key=lambda i: got[i].pri_rank)] == order


def test_kmv_small_set_is_exact_and_kth_min_recomputes(spark, tmp_path):
    """Type 'small' has 5 distinct users (< k = 8): the sketch must
    fall back to the exact count with zero error. Type 'big' has 20:
    the k-th minimum and the (k-1)*H/kth_min estimate are recomputed
    from the same md5 prefix in pure Python. Each user appears twice so
    the pre-sketch distinct is load-bearing."""
    from movie_data_transformer_spark.operators.sketch_extras_queries import (
        q_agg_kmv_bottomk,
    )

    rows = []
    eid = 0
    for u in range(1, 6):
        for _ in range(2):
            eid += 1
            rows.append((eid, u, "small", pd.Timestamp("2024-03-01")))
    for u in range(1, 21):
        for _ in range(2):
            eid += 1
            rows.append((eid, u, "big", pd.Timestamp("2024-03-01")))
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {r.event_type: r for r in q_agg_kmv_bottomk(spark, str(tmp_path)).collect()}

    assert got["small"].n_exact == 5
    assert got["small"].kmv_estimate == 5  # small-set rule: exact
    assert got["small"].rel_err_micro == 0

    hashes = sorted(_md5_32(str(u)) for u in range(1, 21))
    kth_min = hashes[7]  # k = 8
    est = 7 * 4294967296 // kth_min
    assert got["big"].n_exact == 20
    assert got["big"].kmv_estimate == est
    assert got["big"].rel_err_micro == abs(est - 20) * 1_000_000 // 20


def test_chi2_recovers_planted_2x2_with_absent_cell(spark, tmp_path):
    """2x2 segment x region table 30/10, 0/20 where the zero cell is
    truly ABSENT from the observed agg (no S2 customer in region 0) —
    it must enter through the spine join with its full expected mass.
    Textbook chi2: E = (20,20,10,10), (O-E)^2/E = 5+5+10+10 = 30, i.e.
    exactly 30_000_000 micro."""
    from movie_data_transformer_spark.operators.eval_extras_queries import (
        q_stats_chi2_contingency,
    )

    pd.DataFrame(
        {"n_nationkey": [0, 1], "n_regionkey": [0, 1]}
    ).to_parquet(tmp_path / "nation.parquet")
    custs = (
        [("S1", 0)] * 30 + [("S1", 1)] * 10 + [("S2", 1)] * 20
    )
    pd.DataFrame(
        {
            "c_custkey": list(range(len(custs))),
            "c_mktsegment": [s for s, _ in custs],
            "c_nationkey": [nk for _, nk in custs],
        }
    ).to_parquet(tmp_path / "customer.parquet")

    row = q_stats_chi2_contingency(spark, str(tmp_path)).collect()[0]
    assert (row.n, row.n_cells) == (60, 4)  # absent cell IS in the spine
    assert row.chi2_micro == 30_000_000


def test_conformal_quantile_and_coverage_on_planted_residuals(spark, tmp_path):
    """Daily purchase counts whose one-step residuals are planted: the
    15 calibration residuals are exactly 1..15, so the rank
    ceil((15+1)*0.9) = 15 order statistic is q = 15; the 6 evaluation
    residuals 5,15,16,3,20,15 cover 4 of 6 (<= q, boundary inclusive —
    the two exactly-at-q days must count as covered). Non-purchase
    events on the same days must be ignored by the filter."""
    from movie_data_transformer_spark.operators.eval_extras_queries import (
        q_conformal_interval_coverage,
    )

    counts = {}
    level = 100
    counts[1] = level
    for i, r in enumerate(range(1, 16), start=2):  # days 2..16: resid 1..15
        level += r
        counts[i] = level
    assert level == 220
    for day, resid, sign in [
        (17, 5, 1), (18, 15, 1), (19, 16, -1),
        (20, 3, 1), (21, 20, -1), (22, 15, 1),
    ]:
        level += sign * resid
        counts[day] = level
    rows = []
    eid = 0
    for day, n in counts.items():
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "purchase", pd.Timestamp(f"2024-01-{day:02d} 08:00:00")))
    for day in (5, 18):  # decoys the purchase filter must drop
        for _ in range(999):
            eid += 1
            rows.append((eid, 2, "view", pd.Timestamp(f"2024-01-{day:02d} 09:00:00")))
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    row = q_conformal_interval_coverage(spark, str(tmp_path)).collect()[0]
    assert (row.n_cal, row.q_abs) == (15, 15)
    assert (row.n_eval, row.n_covered) == (6, 4)
    assert row.coverage_micro == 4 * 1_000_000 // 6  # 666666


def test_lang_id_confusion_places_planted_docs(spark, tmp_path):
    """Seven docs whose marker-token scores are counted by hand: two
    clean en, one clean de, one marker-free de and one zh that both
    fall to the tie default 'de' (the when-chain's lexicographic-first
    language — the documented out-of-vocabulary failure mode), one
    clean es, and one fr whose only markers ('la la') tie es and fr so
    the tie rule sends it to es. The confusion matrix is exact."""
    from movie_data_transformer_spark.operators.eval_extras_queries import (
        q_lang_id_confusion,
    )

    docs = [
        (1, "en", "the cat and the dog of note"),  # en score 4
        (2, "en", "the fish"),                     # en score 1
        (3, "de", "der hund und die katze"),       # de score 3
        (4, "de", "plain words only"),             # all 0 -> tie -> de
        (5, "zh", "hanzi wenben"),                 # all 0 -> tie -> de
        (6, "es", "el gato que de un"),            # es score 4
        (7, "fr", "la la"),                        # es 2 == fr 2 -> es
    ]
    pd.DataFrame(docs, columns=["doc_id", "lang", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )

    got = {
        (r.actual_lang, r.pred_lang): r.n
        for r in q_lang_id_confusion(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("en", "en"): 2,
        ("de", "de"): 2,
        ("zh", "de"): 1,
        ("es", "es"): 1,
        ("fr", "es"): 1,
    }


def _bucket(w: str) -> int:
    return (_md5_32(w) % 2001) - 1000


def _rater_words(positive: bool, n: int, taken: set) -> list:
    """n distinct unused words whose md5 buckets all have the requested
    sign — so the classifier gate's token sum has a KNOWN sign without
    replicating the sum itself."""
    out = []
    i = 0
    while len(out) < n:
        w = f"w{i}"
        i += 1
        if w in taken:
            continue
        b = _bucket(w)
        if (b > 0) == positive and b != 0:
            out.append(w)
            taken.add(w)
    return out


def test_rater_stats_recover_planted_vote_pattern(spark, tmp_path):
    """Six documents whose three gate votes (token-count >= 30, TTR >=
    0.2, hashed-classifier sign) are CONSTRUCTED: word sets are picked by
    md5-bucket sign in pure Python, so the per-doc keep-vote vector is
    known to be k = [3, 3, 0, 2, 2, 2] before either engine runs. All
    three rater statistics then have closed-form values: Fleiss kappa
    72/288 = 0.25, McNemar b=2/c=1 with statistic 1/3 (and a continuity
    correction that zeroes at |b-c| = 1), Krippendorff alpha
    1 - 6*17/144 = 42/144."""
    from movie_data_transformer_spark.operators.krippendorff_queries import (
        q_stats_krippendorff_alpha,
    )
    from movie_data_transformer_spark.operators.rater_eval_queries import (
        _flags,
        q_stats_fleiss_kappa,
        q_stats_mcnemar_exact,
    )

    taken = set()
    texts = {
        # (r1, r2, r3) -> rule = r1 AND r2, clf = r3
        1: " ".join(_rater_words(True, 30, taken)),   # (T,T,T) k=3
        2: " ".join(_rater_words(True, 30, taken)),   # (T,T,T) k=3
        # 10 copies of one negative word: 10 < 30 tokens, TTR 0.1 < 0.2,
        # sum 10*negative < 0
        3: " ".join(_rater_words(False, 1, taken) * 10),  # (F,F,F) k=0
        4: " ".join(_rater_words(False, 30, taken)),  # (T,T,F) k=2  b
        5: " ".join(_rater_words(True, 5, taken)),    # (F,T,T) k=2  c
        6: " ".join(_rater_words(False, 30, taken)),  # (T,T,F) k=2  b
    }
    pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    ).to_parquet(tmp_path / "documents.parquet")

    # the construction realized the intended votes (localizes a failure)
    votes = {
        r.doc_id: (r.r1, r.r2, r.r3)
        for r in _flags(spark, str(tmp_path)).collect()
    }
    assert votes == {
        1: (True, True, True), 2: (True, True, True),
        3: (False, False, False), 4: (True, True, False),
        5: (False, True, True), 6: (True, True, False),
    }

    mc = q_stats_mcnemar_exact(spark, str(tmp_path)).collect()[0]
    assert (mc.n_docs, mc.n_rule_only, mc.n_clf_only) == (6, 2, 1)
    assert mc.mcnemar_micro == 1_000_000 // 3  # (2-1)^2 / 3
    assert mc.mcnemar_cc_micro == 0  # |b-c| <= 1 zeroes the correction

    # k = [3,3,0,2,2,2]: S = 42, nm = 18, C1 = 12, E = 144 + 36 = 180
    fl = q_stats_fleiss_kappa(spark, str(tmp_path)).collect()[0]
    assert fl.pbar_micro == (42 - 18) * 1_000_000 // 36    # 666666
    assert fl.pe_micro == 180 * 1_000_000 // 324           # 555555
    assert fl.fleiss_kappa_micro == 250_000  # exactly 1/4

    # Do_num = sum k(3-k) = 6; alpha = 1 - 6*17/(2*12*6)
    ka = q_stats_krippendorff_alpha(spark, str(tmp_path)).collect()[0]
    assert (ka.n_docs, ka.do_num, ka.c1, ka.c0) == (6, 6, 12, 6)
    assert ka.alpha_micro == 1_000_000 - 102_000_000 // 144  # 291667


def test_ips_snips_on_planted_bandit_log(spark, tmp_path):
    """Six logged interactions whose by_mod policy actions are pinned by
    user_id % 5 (users 0..4 map to click/error/purchase/signup/view):
    by_mod matches 4 of 6 with 950 matched cents, always_purchase 2 of 6
    with 700 — IPS (propensity-weighted by the constant 5, DIV n) and
    SNIPS (matched mean) diverge exactly as the match rates differ from
    the uniform 1/5."""
    from movie_data_transformer_spark.operators.policy_eval_queries import (
        q_policy_ips_offline_eval,
    )

    rows = [
        (1, 0, "click", 1.00),     # by_mod: pi(0)=click  -> match, 100c
        (2, 0, "view", 2.00),      # no match either policy
        (3, 2, "purchase", 3.00),  # by_mod+always_purchase match, 300c
        (4, 3, "purchase", 4.00),  # always_purchase only, 400c
        (5, 4, "view", 5.00),      # by_mod: pi(4)=view -> match, 500c
        (6, 1, "error", 0.50),     # by_mod: pi(1)=error -> match, 50c
    ]
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value"]
    ).assign(ts=pd.Timestamp("2024-04-01")).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {
        r.policy: r
        for r in q_policy_ips_offline_eval(spark, str(tmp_path)).collect()
    }
    bm = got["by_mod"]
    assert (bm.n_logged, bm.n_matched) == (6, 4)
    assert bm.ips_value_cents == 950 * 5 // 6   # 791
    assert bm.snips_value_cents == 950 // 4     # 237
    ap = got["always_purchase"]
    assert (ap.n_logged, ap.n_matched) == (6, 2)
    assert ap.ips_value_cents == 700 * 5 // 6   # 583
    assert ap.snips_value_cents == 700 // 2     # 350


def test_regex_funnel_counts_greedy_nonoverlapping(spark, tmp_path):
    """Per-user sequences built to separate the pattern semantics: a
    'vcpvp' user yields TWO funnels (leftmost non-overlapping), an
    'eeee' user yields ONE burst (greedy ee+ swallows the run — an
    overlapping or non-greedy counter says 2), 'veep' has no funnel
    because the error breaks the v-c*-p chain, and one user's funnel
    exists only under the (ts, event_id) tie order."""
    from movie_data_transformer_spark.operators.seqpattern_queries import (
        q_events_seq_regex_funnel,
    )

    t = [pd.Timestamp(f"2024-05-01 00:00:{s:02d}") for s in range(10)]
    rows = [
        # u1: v c p v p -> funnels 'vcp' + 'vp'
        (1, 1, "view", t[0]), (2, 1, "click", t[1]), (3, 1, "purchase", t[2]),
        (4, 1, "view", t[3]), (5, 1, "purchase", t[4]),
        # u2: v e e p -> 0 funnels, 1 burst
        (6, 2, "view", t[0]), (7, 2, "error", t[1]), (8, 2, "error", t[2]),
        (9, 2, "purchase", t[3]),
        # u3: e e e e -> ONE greedy burst
        (10, 3, "error", t[0]), (11, 3, "error", t[1]),
        (12, 3, "error", t[2]), (13, 3, "error", t[3]),
        # u4: v v c c p -> one funnel starting at the SECOND v
        (14, 4, "view", t[0]), (15, 4, "view", t[1]), (16, 4, "click", t[2]),
        (17, 4, "click", t[3]), (18, 4, "purchase", t[4]),
        # u5: tied timestamps — event_id must order c before p
        (19, 5, "view", t[0]), (21, 5, "purchase", t[1]), (20, 5, "click", t[1]),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {
        r.user_id: (r.n_events, r.n_funnel_matches, r.n_error_bursts)
        for r in q_events_seq_regex_funnel(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (5, 2, 0),
        2: (4, 0, 1),
        3: (4, 0, 1),
        4: (5, 1, 0),
        5: (3, 1, 0),
    }


def test_blocking_quality_on_the_planted_linkage_parts(spark, tmp_path):
    """The same four parts as the Fellegi-Sunter gate: block counts by
    hand are A = {bolt|1: 4}, B = {bolt|1: 3, bolt|2: 1}, so candidates
    = 12 of the 16-pair universe (reduction 1/4), 3 of the 4 true pairs
    share their block (completeness 3/4 — the size-bumped twin crosses
    the band and is the measured recall cost), and quality is 3/12."""
    from movie_data_transformer_spark.operators.blocking_queries import (
        q_er_blocking_quality,
    )

    custs = [
        (3, "red bolt", "B1", 10),
        (6, "blu bolt", "B2", 10),
        (4, "ab bolt", "B1", 10),
        (5, "red bolt", "B1", 15),
    ]
    pd.DataFrame(
        custs, columns=["p_partkey", "p_name", "p_brand", "p_size"]
    ).to_parquet(tmp_path / "part.parquet")

    row = q_er_blocking_quality(spark, str(tmp_path)).collect()[0]
    assert (row.n_records, row.n_total_pairs) == (4, 16)
    assert row.n_candidate_pairs == 12
    assert (row.n_true_pairs, row.n_true_in_candidates) == (4, 3)
    assert row.reduction_ratio_micro == 1_000_000 - 12_000_000 // 16  # 250000
    assert row.pairs_completeness_micro == 750_000
    assert row.pairs_quality_micro == 250_000


# texts whose word / sentence / vowel-group counts are trivial to count
# by hand, giving exact FKGL micro values through the integer formula
# (390000*w DIV s + 11800000*y DIV w - 15590000):
_TXT_EASY = "bo bo. bo bo."                  # w=4 s=2 y=4  -> -3010000
_TXT_MID = "bobo bobo bobo bobo"             # w=4 s=1 y=8  ->  9570000
_TXT_HARD = "banana banana. banana banana."  # w=4 s=2 y=12 -> 20590000


def test_datacard_aggregates_planted_sources(spark, tmp_path):
    """Source 'web' holds three docs — two byte-identical (dup rate
    1/3), two en of three (pct 2/3), planted n_chars 100/200/300 — and
    source 'books' one hard doc; every datacard field is exact."""
    from movie_data_transformer_spark.operators.datacard_queries import (
        q_datacard_by_source,
    )

    docs = [
        (1, "web", "en", 100, _TXT_EASY),
        (2, "web", "en", 200, _TXT_EASY),  # exact duplicate text
        (3, "web", "de", 300, _TXT_MID),
        (4, "books", "en", 50, _TXT_HARD),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "source", "lang", "n_chars", "text"]
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r.source: r for r in q_datacard_by_source(spark, str(tmp_path)).collect()}
    web = got["web"]
    assert (web.n_docs, web.n_tokens, web.n_unique_texts) == (3, 12, 2)
    assert web.dup_rate_micro == 1_000_000 // 3
    assert web.pct_en_micro == 2_000_000 // 3
    assert web.mean_chars == 200
    # (-3010000 - 3010000 + 9570000) DIV 3
    assert web.mean_fkgl_micro == 3_550_000 // 3
    books = got["books"]
    assert (books.n_docs, books.n_unique_texts, books.dup_rate_micro) == (1, 1, 0)
    assert books.mean_fkgl_micro == 20_590_000


def test_curriculum_phases_split_at_the_planted_grades(spark, tmp_path):
    """The three constructed texts land one per phase: FKGL -3.01 < 8
    (phase 1), 9.57 in [8, 12) (phase 2), 20.59 >= 12 (phase 3); means
    are exact because every doc in a cell shares its planted counts."""
    from movie_data_transformer_spark.operators.datacard_queries import (
        q_curriculum_phase_assign,
    )

    docs = [
        (1, "web", "en", 100, _TXT_EASY),
        (2, "web", "en", 200, _TXT_EASY),
        (3, "web", "de", 300, _TXT_MID),
        (4, "books", "en", 50, _TXT_HARD),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "source", "lang", "n_chars", "text"]
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        (r.phase, r.lang): (r.n_docs, r.mean_fkgl_micro, r.mean_tokens)
        for r in q_curriculum_phase_assign(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, "en"): (2, -3_010_000, 4),
        (2, "de"): (1, 9_570_000, 4),
        (3, "en"): (1, 20_590_000, 4),
    }


def _py_phash(d: int) -> int:
    """The full pHash pipeline replayed in pure Python from the planted
    pixel formula and the integer cosine table — the third
    implementation next to the Spark decoder and the DuckDB oracle."""
    from movie_data_transformer_spark.operators.multimodal import COS8_MICRO

    w, h = 4 + d % 13, 4 + d % 9
    luma = [
        [
            2 * ((d * 7 + (xx * w // 8) * 13 + (yy * h // 8) * 31) % 256)
            + 5 * ((d * 11 + (xx * w // 8) * 17 + (yy * h // 8) * 5) % 256)
            + ((d * 3 + (xx * w // 8) * 29 + (yy * h // 8) * 23) % 256)
            for xx in range(8)
        ]
        for yy in range(8)
    ]
    coef = {
        (k, l): sum(
            luma[yy][xx] * COS8_MICRO[k][yy] * COS8_MICRO[l][xx]
            for yy in range(8)
            for xx in range(8)
        )
        for k in range(4)
        for l in range(4)
    }
    ac = sorted(v for kl, v in coef.items() if kl != (0, 0))
    m2 = ac[7] + ac[8]
    median = m2 // 2 if m2 >= 0 else -((-m2) // 2)
    return sum(
        1 << (k * 4 + l - 1)
        for k in range(4)
        for l in range(4)
        if (k, l) != (0, 0) and coef[(k, l)] > median
    )


def test_phash_dup_groups_find_planted_collisions(spark, tmp_path):
    """doc_ids 1/768/1288 and 5/257 were FOUND (by replaying the whole
    pipeline in Python) to share their 15-bit DCT fingerprints (130 and
    24384); planted next to two non-colliding singletons, the dup-group
    report must emit exactly the two groups with those hashes and id
    ranges — a drift anywhere in decode, resize, DCT, median, or bit
    packing moves a hash and breaks a group."""
    from movie_data_transformer_spark.operators.phash_queries import (
        q_mm_phash_dup_groups,
    )

    ids = [1, 768, 1288, 5, 257, 2, 7]
    assert _py_phash(1) == _py_phash(768) == _py_phash(1288) == 130
    assert _py_phash(5) == _py_phash(257) == 24384
    singles = {_py_phash(2), _py_phash(7)}
    assert len(singles) == 2 and not (singles & {130, 24384})

    pd.DataFrame({"doc_id": ids}).to_parquet(tmp_path / "documents.parquet")

    got = {
        r.phash: (r.n_images, r.min_doc_id, r.max_doc_id)
        for r in q_mm_phash_dup_groups(spark, str(tmp_path)).collect()
    }
    assert got == {130: (3, 1, 1288), 24384: (2, 5, 257)}


def _orders(tmp_path, spends_cents):
    """orders.parquet where customer i's total spend is spends_cents[i],
    split across TWO orders so the per-customer aggregate is
    load-bearing."""
    rows = []
    ok = 0
    for ck, cents in enumerate(spends_cents, start=1):
        a = cents // 3
        for part in (a, cents - a):
            ok += 1
            rows.append((ok, ck, part / 100.0))
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).to_parquet(tmp_path / "orders.parquet")


def test_gini_recovers_planted_concentration(spark, tmp_path):
    """Spends 1,2,3,4 dollars give the textbook rank-identity Gini
    2*3000/(4*1000) - 5/4 = 1/4 exactly; equal spends give 0."""
    from movie_data_transformer_spark.operators.analytics_queries import (
        q_orders_gini_spend,
    )

    d1 = tmp_path / "ladder"
    d1.mkdir()
    _orders(d1, [100, 200, 300, 400])
    row = q_orders_gini_spend(spark, str(d1)).collect()[0]
    assert (row.n_customers, row.total_cents) == (4, 1000)
    assert row.gini_micro == 250_000

    d2 = tmp_path / "equal"
    d2.mkdir()
    _orders(d2, [500, 500])
    row = q_orders_gini_spend(spark, str(d2)).collect()[0]
    assert row.gini_micro == 0


def test_pareto_share_picks_planted_top_fifth(spark, tmp_path):
    """Six customers spending 6,5,4,3,2,1 dollars: top_n = ceil(6/5) =
    2, so the top share is (600+500)/2100 — floored micro 523809."""
    from movie_data_transformer_spark.operators.analytics_queries import (
        q_orders_pareto_share,
    )

    _orders(tmp_path, [600, 500, 400, 300, 200, 100])
    row = q_orders_pareto_share(spark, str(tmp_path)).collect()[0]
    assert (row.n_customers, row.top_n) == (6, 2)
    assert (row.top_cents, row.total_cents) == (1100, 2100)
    assert row.share_micro == 1_100_000_000 // 2100  # 523809


def test_points_in_boxes_counts_planted_boundary_cases(spark, tmp_path):
    """The md5 geometry is replayed in Python to FIND event ids that
    land exactly on box edges (inclusive BETWEEN -> counted), exactly on
    a grid-cell boundary inside a box (the single-cell-ownership rule),
    strictly inside, and one unit outside (near-miss -> excluded). The
    grid-decomposed join must count precisely the contained ones."""
    from movie_data_transformer_spark.operators.geo_extras_queries import (
        q_join_points_in_boxes_grid,
    )

    ids = [
        756, 1882, 2741, 4001,      # ON a box edge/corner of boxes 0/2/2/3
        42975, 72779, 73137,        # inside box 3, ON the y=400 cell line
        261, 562, 774, 845,         # strictly inside boxes 3/2/2/1
        4152, 5043, 11791,          # one unit outside boxes 2/2/1
    ]
    SPACE = 1000

    def pt(e):
        return _md5_32(f"px:{e}") % SPACE, _md5_32(f"py:{e}") % SPACE

    boxes = {}
    for nk in range(4):
        x0 = _md5_32(f"bx:{nk}") % (SPACE - 100)
        y0 = _md5_32(f"by:{nk}") % (SPACE - 100)
        boxes[f"N{nk}"] = (x0, y0, x0 + 20 + nk * 7 % 77, y0 + 20 + nk * 11 % 77)

    expected = {}
    for e in ids:
        px, py = pt(e)
        for name, (x0, y0, x1, y1) in boxes.items():
            if x0 <= px <= x1 and y0 <= py <= y1:
                expected[name] = expected.get(name, 0) + 1
    assert expected == {"N0": 1, "N1": 1, "N2": 4, "N3": 5}  # the design

    pd.DataFrame(
        {"n_nationkey": range(4), "n_name": [f"N{k}" for k in range(4)],
         "n_regionkey": [0, 0, 1, 1]}
    ).to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame(
        {"event_id": ids, "user_id": 1, "event_type": "view",
         "ts": pd.Timestamp("2024-06-01")}
    ).to_parquet(tmp_path / "events.parquet")

    got = {
        r.n_name: r.n_points
        for r in q_join_points_in_boxes_grid(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_kaplan_meier_on_planted_cohort(spark, tmp_path):
    """Five signups at day 0: two purchase on day 2, one on day 5, two
    never (censored at the planted day-10 horizon). The product-limit
    curve is textbook: S(2) = 1 - 2/5, S(5) = S(2) * (1 - 1/3); censored
    users appear in the at-risk counts but emit no step. The survival
    doubles must equal the identical IEEE left-fold in Python."""
    from movie_data_transformer_spark.operators.timeseries_queries import (
        q_survival_km_purchase,
    )

    day = pd.Timedelta(days=1)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u in range(1, 6):
        eid += 1
        rows.append((eid, u, "signup", t0))
    for u, d in [(1, 2), (2, 2), (3, 5)]:
        eid += 1
        rows.append((eid, u, "purchase", t0 + d * day))
    rows.append((99, 1, "view", t0 + 10 * day))  # horizon setter
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {r.t: r for r in q_survival_km_purchase(spark, str(tmp_path)).collect()}
    assert set(got) == {2, 5}  # censor-only times emit no step
    assert (got[2].n_at_risk, got[2].d) == (5, 2)
    assert (got[5].n_at_risk, got[5].d) == (3, 1)
    s2 = 1.0 * (1.0 - 2.0 / 5.0)
    s5 = s2 * (1.0 - 1.0 / 3.0)
    assert got[2].survival == s2
    assert got[5].survival == s5


def test_export_manifest_matches_python_shard_replay(spark, tmp_path):
    """40 docs with known token counts: the whole shard assignment
    (md5 'shard:' bucket, within-shard order by md5 'pos:' then doc_id)
    is replayed in pure Python, so every manifest field — counts,
    tokens, id ranges, the sum(doc_id * pos) checksum — has an
    engine-independent expectation; and the read-back sort audit must
    report every exported shard file as physically pos-ordered."""
    from movie_data_transformer_spark.operators.curation_queries import (
        q_export_training_manifest,
    )

    n_tok = {d: (d % 3) + 1 for d in range(1, 41)}
    pd.DataFrame(
        {
            "doc_id": list(n_tok),
            "text": [" ".join(["tok"] * n_tok[d]) for d in n_tok],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    shards = {}
    for d in n_tok:
        shards.setdefault(_md5_32(f"shard:{d}") % 16, []).append(d)
    expected = {}
    for sh, ds in shards.items():
        order = sorted(ds, key=lambda d: (_md5_32(f"pos:{d}"), d))
        expected[sh] = (
            len(ds),
            sum(n_tok[d] for d in ds),
            min(ds),
            max(ds),
            sum(d * (i + 1) for i, d in enumerate(order)),
        )

    manifest = q_export_training_manifest(spark, str(tmp_path)).collect()
    got = {
        r.shard: (r.n_docs, r.n_tokens, r.min_doc_id, r.max_doc_id,
                  r.assign_checksum)
        for r in manifest
    }
    assert got == expected
    assert all(r.is_sorted for r in manifest)


def test_rake_scores_planted_phrases(spark):
    """Four-doc corpus whose RAKE arithmetic is done by hand: en word
    scores are deep 13/5 (the 'deep deep deep' run inflates its degree),
    learning 6/3, models 2/1, rates 4/2 — so 'deep deep deep' tops at
    7.8M, the 4.6M tie between 'deep learning' and 'deep models' breaks
    on phrase order, and a phrase occurring in two docs appears once.
    The de doc repeats 'deep learning' but scores 4.0M, not en's 4.6M —
    corpus statistics must not leak across languages."""
    from movie_data_transformer_spark.operators.keyword_queries import (
        rake_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "deep learning of deep models and learning rates"),
            (2, "en", "deep deep deep"),
            (3, "en", "learning rates"),
            (4, "de", "deep learning"),
        ],
        "doc_id long, lang string, text string",
    )
    got = [
        (r.lang, r.rk, r.phrase, r.n_words, r.score_micro)
        for r in sorted(
            rake_keywords(docs).collect(), key=lambda r: (r.lang, r.rk)
        )
    ]
    assert got == [
        ("de", 1, "deep learning", 2, 4_000_000),
        ("en", 1, "deep deep deep", 3, 7_800_000),
        ("en", 2, "deep learning", 2, 4_600_000),
        ("en", 3, "deep models", 2, 4_600_000),
        ("en", 4, "learning rates", 2, 4_000_000),
    ]
