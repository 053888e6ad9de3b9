"""Planted-truth gates for the r12 driver window's formula-heavy
corners that still leaned on the oracle differential alone (r11 VERDICT
advice #4; the two entries it NAMED — er_fellegi_sunter and
stats_ks_two_sample — already carry r10 planted gates in
test_r10_planted.py, so this file targets the window's remaining thin
entries: each had only a Python-recompute or property test, which
shares the formula reading with the engines). Every expected value
below is derived BY HAND in the comments, independent of Spark, DuckDB,
and numpy.

* text_zipf_fit: a two-language corpus whose rank ladder is an exact
  decade — f1=800, f10=8, so zipf_s_micro = floor(log10(100)*1e6) is
  EXACTLY 2_000_000 (the ratio 800.0/8.0 is the exact double 100.0 and
  correctly-rounded log10 of it is exactly 2.0) — with a count TIE at
  ranks 10/11, cross-document type accumulation, case folding, and a
  4-type language pinning the f5/f10 NULL branch.

* score_psi_bins: ref/cur windows of exactly 56 rows each so the
  smoothed denominators are 64 and every smoothed proportion is
  DYADIC: the two drifted bins have p=32/64 vs q=16/64, whose term is
  0.25*ln(2.0) — the multiply by 0.25 is an exact exponent shift, so
  the only rounding is the final *1e6, giving 173286.795... -> floor
  173286 on ANY IEEE libm with correctly-rounded ln(2.0). The six
  undrifted bins pin the exact-zero term, and boundary values sit
  exactly ON bin edges (5 -> b1, 320 -> b7) and ON the window split
  (ts == SPLIT -> current, strict <).

* emb_norm_stats: hand-quantized vectors — dyadic coords (0.5, -0.25,
  1.0) whose micro squares are exact, a truncating mean (sum 4_250_000
  DIV 3 = 1_416_666, not the rounded 1_416_667), the near-zero
  collapse detector, and a NEGATIVE sub-micro coordinate -1.4e-6 whose
  scaled value lies strictly inside (-2, -1): floor gives -2 (normsq
  contribution 4) where a truncate-toward-zero bug gives -1 (normsq 1).

* curation_target_affinity_select: a one-seed-doc vocabulary of two
  trigram shingles and twelve hand-scored candidates — pinning
  within-doc shingle DISTINCTness ("z z z z" is ONE shingle), the
  short-doc (<3 tokens) single-shingle branch, seed exclusion from the
  candidate pool, whitespace/case normalization, the (affinity DESC,
  doc_id ASC) tie order among three 500000-scoring docs, and the
  top-10 cut dropping ranks 11-12.

* agg_theta_setops: below the lgK=12 capacity a Theta sketch is exact,
  so a hand-countable two-week audience pins the whole set algebra —
  a day with ZERO purchases (the all-NULL theta_sketch_agg group must
  union as an EMPTY sketch, not NULL), a user viewing on BOTH days of
  one week (the cross-day union must dedup), an event type outside
  view/purchase that counts nowhere, and exact
  viewers/purchasers/intersection/difference per ISO week.

* running_user_totals_exact (the applyInPandasWithState surface behind
  stream_stateful_totals, which had NO dedicated test): a hand-built
  THREE-micro-batch stream (three parquet files, mtime-ordered,
  maxFilesPerTrigger=1) whose per-batch update-mode emissions are
  asserted one by one — state continuity across batches, the
  half-UP cent rounding on exact half-cents (0.005 -> 1 cent where
  pandas' half-even .round() gives 0), the (ts, event_id) total-order
  tiebreak on a tied-timestamp pair, and an out-of-order LATE event
  whose newer arrival must NOT displace the event-time latest.
"""

from __future__ import annotations

import pandas as pd


def test_zipf_fit_recovers_planted_decade(spark, tmp_path):
    from movie_data_transformer_spark.operators.zipf_queries import (
        q_text_zipf_fit,
    )

    # lang 'aa' type counts (spread across three docs; 100 of the
    # 'apple' occurrences are uppercased to pin lower()):
    #   apple 800, bay 400, cod 200, dew 100, elm 64, fig 32, gum 24,
    #   hay 16, ivy 12, jet 8, kit 8, x1 1, y1 1
    # ranks (count DESC, token ASC): apple..ivy = 1..9, then jet/kit
    # TIE at count 8 -> 'jet' < 'kit' takes rank 10. f1=800, f5=elm=64,
    # f10=jet=8; zipf_s_micro = floor(log10(800/8) * 1e6) = 2_000_000.
    doc_a = " ".join(["APPLE"] * 100 + ["apple"] * 700)
    doc_b = " ".join(
        ["bay"] * 400 + ["cod"] * 200 + ["dew"] * 100 + ["elm"] * 64
    )
    doc_c = "  ".join(  # double spaces: the \s+ split must not mint '' types
        ["fig"] * 32 + ["gum"] * 24 + ["hay"] * 16 + ["ivy"] * 12
        + ["jet"] * 8 + ["kit"] * 8 + ["x1", "y1"]
    )
    # lang 'bb': only 4 types -> ranks 5 and 10 never exist (NULL branch)
    doc_d = "p p p p p p p q q q r r s"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [doc_a, doc_b, doc_c, doc_d],
            "lang": ["aa", "aa", "aa", "bb"],
            "source": ["s"] * 4,
            "n_chars": [len(doc_a), len(doc_b), len(doc_c), len(doc_d)],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r.lang: r for r in q_text_zipf_fit(spark, str(tmp_path)).collect()}
    assert set(got) == {"aa", "bb"}
    aa = got["aa"]
    assert (aa.f1, aa.f5, aa.f10) == (800, 64, 8)
    assert aa.zipf_s_micro == 2_000_000
    bb = got["bb"]
    assert bb.f1 == 7
    assert bb.f5 is None and bb.f10 is None and bb.zipf_s_micro is None


def test_psi_bins_recover_planted_dyadic_terms(spark, tmp_path):
    from movie_data_transformer_spark.operators.psi_queries import (
        q_score_psi_bins,
    )

    # 56 ref rows + 56 cur rows -> smoothed denominators 56 + 8 = 64.
    # per-bin (ref_n, cur_n): b0 (31,15), b1 (15,31), b2 (1,1),
    # b3 (1,1), b4..b7 (2,2). Drifted terms:
    #   b0: (32/64 - 16/64) * ln(32*64 / (16*64)) = 0.25 * ln(2.0)
    #       = 0.17328679513998632 -> 173286 micro (floor; the 0.25
    #       multiply is an exact exponent shift, so the ONLY rounding
    #       is the final 1e6 scale — engine-independent)
    #   b1: (-0.25) * ln(0.5) = the SAME product -> 173286
    #   b2..b7: p == q exactly -> 0.0 * ln(1.0) = 0.0 -> 0
    # Boundary pins: b1's ref rows sit exactly ON edge 5 (< 5 false,
    # < 10 true), b7 includes value exactly 320 (-> gte bucket), and
    # one cur row sits exactly AT the split timestamp (strict <).
    ref_ts = pd.Timestamp("2024-01-10 08:00:00")
    cur_ts = pd.Timestamp("2024-01-20 08:00:00")
    split_ts = pd.Timestamp("2024-01-16 00:00:00")
    bin_vals = {0: 1.0, 1: 5.0, 2: 15.0, 3: 25.0, 4: 50.0,
                5: 100.0, 6: 200.0, 7: 320.0}
    counts = {0: (31, 15), 1: (15, 31), 2: (1, 1), 3: (1, 1),
              4: (2, 2), 5: (2, 2), 6: (2, 2), 7: (2, 2)}
    rows = []
    for b, (rn, cn) in counts.items():
        rows += [(len(rows) + i, bin_vals[b], ref_ts) for i in range(rn)]
        rows += [(1000 + len(rows) + i, bin_vals[b], cur_ts)
                 for i in range(cn)]
    # move one b7 current row exactly onto the split instant
    for i, (eid, v, ts) in enumerate(rows):
        if v == 320.0 and ts == cur_ts:
            rows[i] = (eid, v, split_ts)
            break
    assert sum(c[0] for c in counts.values()) == 56
    assert sum(c[1] for c in counts.values()) == 56
    pd.DataFrame(rows, columns=["event_id", "value", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )

    got = {r.bin: r for r in q_score_psi_bins(spark, str(tmp_path)).collect()}
    assert set(got) == {
        "b0_lt5", "b1_lt10", "b2_lt20", "b3_lt40",
        "b4_lt80", "b5_lt160", "b6_lt320", "b7_gte320",
    }
    assert (got["b0_lt5"].ref_n, got["b0_lt5"].cur_n) == (31, 15)
    assert got["b0_lt5"].psi_term_micro == 173286
    assert (got["b1_lt10"].ref_n, got["b1_lt10"].cur_n) == (15, 31)
    assert got["b1_lt10"].psi_term_micro == 173286
    for b in ("b2_lt20", "b3_lt40", "b4_lt80", "b5_lt160",
              "b6_lt320", "b7_gte320"):
        assert got[b].psi_term_micro == 0, b
    assert sum(r.psi_term_micro for r in got.values()) == 346572


def test_emb_norm_stats_planted_quantization(spark, tmp_path):
    import numpy as np

    from movie_data_transformer_spark.operators.embnorm_queries import (
        q_emb_norm_stats,
    )

    # label 1: [0.5, -0.25] -> micro (500000, -250000), normsq
    #   250_000_000_000 + 62_500_000_000 = 312_500_000_000 (dyadic,
    #   exact). [-1.4e-6, 0.0]: the float nearest -1.4e-6 scaled by 1e6
    #   lies strictly in (-2, -1), so floor -> -2 and normsq = 4; a
    #   truncate-toward-zero bug gives -1 / normsq 1. mean =
    #   312_500_000_004 DIV 2 = 156_250_000_002; near_zero = 1 (4 <
    #   1e10 but 3.125e11 is not).
    # label 2: [1.0, 0.0, 0.0] -> normsq exactly 1e12, no near-zero.
    # label 3: three collapsed vectors [0.001] [0.001] [0.0015] ->
    #   micro 1000/1000/1500 (float32 0.001 and 0.0015 land just above
    #   the grid line), normsq 1e6/1e6/2.25e6; mean = 4_250_000 DIV 3
    #   = 1_416_666 (TRUNCATING div — rounding would give 1_416_667);
    #   all three are near-zero.
    f32 = lambda xs: np.array(xs, dtype=np.float32)
    pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4, 5, 6],
            "embedding": [
                f32([0.5, -0.25]),
                f32([-1.4e-6, 0.0]),
                f32([1.0, 0.0, 0.0]),
                f32([0.001]),
                f32([0.001]),
                f32([0.0015]),
            ],
            "label": [1, 1, 2, 3, 3, 3],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    got = {r.label: r for r in q_emb_norm_stats(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}
    l1 = got[1]
    assert (l1.n_vecs, l1.min_normsq, l1.max_normsq) == (2, 4, 312_500_000_000)
    assert l1.mean_normsq == 156_250_000_002
    assert l1.n_near_zero == 1
    l2 = got[2]
    assert (l2.n_vecs, l2.mean_normsq, l2.n_near_zero) == (1, 10**12, 0)
    l3 = got[3]
    assert (l3.n_vecs, l3.min_normsq, l3.max_normsq) == (3, 1_000_000, 2_250_000)
    assert l3.mean_normsq == 1_416_666  # DIV truncates
    assert l3.n_near_zero == 3


def test_affinity_select_planted_overlap(spark, tmp_path):
    from movie_data_transformer_spark.operators.affinity_queries import (
        q_curation_target_affinity_select,
    )

    # Seed (doc_id 20, the only doc_id % 20 == 0): "a b c d" -> vocab
    # = {"a b c", "b c d"}. Candidate trigram shingle sets and scores
    # (affinity = 1e6 * hits div shingles), all hand-derived:
    #   1  "A  b   C x"        -> {a b c, b c x}          1/2 -> 500000
    #      (mixed case + runs of spaces: normalization pinned)
    #   2  "a b c d e"         -> {a b c, b c d, c d e}   2/3 -> 666666
    #   3  "z z z z"           -> {z z z} (DISTINCT!)     0/1 -> 0
    #   4  "a b" (short doc)   -> {a b} single shingle    0/1 -> 0
    #   5  "a b c q1 q2 q3 q4 q5" -> 6 shingles, 1 hit    -> 166666
    #   6  "a b c m"           -> {a b c, b c m}          1/2 -> 500000
    #   7-9, 11-12: disjoint filler -> 0
    #   10 "b c d y"           -> {b c d, c d y}          1/2 -> 500000
    # s1 ordering (affinity DESC, doc_id ASC): 2, 1, 6, 10, 5, then the
    # zeros by doc_id: 3, 4, 7, 8, 9 — rank 10 cuts HERE, so docs 11
    # and 12 fall out. Source s2 ranks independently.
    texts = {
        1: ("s1", "A  b   C x"),
        2: ("s1", "a b c d e"),
        3: ("s1", "z z z z"),
        4: ("s1", "a b"),
        5: ("s1", "a b c q1 q2 q3 q4 q5"),
        6: ("s1", "a b c m"),
        7: ("s1", "p1 p2 p3"),
        8: ("s1", "p4 p5 p6"),
        9: ("s1", "p7 p8 p9"),
        10: ("s1", "b c d y"),
        11: ("s1", "w1 w2 w3"),
        12: ("s1", "w4 w5 w6"),
        20: ("s1", "a b c d"),  # the seed: excluded from candidates
        21: ("s2", "b c d k1"),
    }
    pd.DataFrame(
        [
            (i, t, "en", s, len(t))
            for i, (s, t) in texts.items()
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")

    rows = q_curation_target_affinity_select(spark, str(tmp_path)).collect()
    s1 = sorted(
        ((r.sel_rank, r.doc_id, r.affinity_micro) for r in rows
         if r.source == "s1")
    )
    assert s1 == [
        (1, 2, 666666),
        (2, 1, 500000),
        (3, 6, 500000),
        (4, 10, 500000),
        (5, 5, 166666),
        (6, 3, 0),
        (7, 4, 0),
        (8, 7, 0),
        (9, 8, 0),
        (10, 9, 0),
    ]
    s2 = [(r.sel_rank, r.doc_id, r.affinity_micro) for r in rows
          if r.source == "s2"]
    assert s2 == [(1, 21, 500000)]
    assert all(r.doc_id != 20 for r in rows)  # seed never a candidate


def test_theta_setops_exact_planted_audience(spark, tmp_path):
    from movie_data_transformer_spark.operators.datasketches_queries import (
        q_agg_theta_setops,
    )

    # ISO week 27 (2024-07-01 Mon / 2024-07-02 Tue):
    #   day 1: views by users 1,2,3,4 + a 'click' by user 9 (counts
    #          NOWHERE); ZERO purchases -> the day's purchase partial is
    #          an all-NULL theta_sketch_agg group, which must union as
    #          an EMPTY sketch (a NULL-poisoned union undercounts week
    #          27 purchasers to 0 visibly)
    #   day 2: views by 4 (again — cross-day union dedup) and 5;
    #          purchases by 3, 4, 6
    #   => viewers {1,2,3,4,5}=5, purchasers {3,4,6}=3, both {3,4}=2,
    #      view_only {1,2,5}=3, n_partials=2
    # ISO week 28 (2024-07-08): views {7}, purchases {7} -> 1/1/1/0/1.
    # All cardinalities are far below the lgK=12 capacity (4096), where
    # Theta sketches are EXACT — the planted counts are ground truth.
    d1 = pd.Timestamp("2024-07-01 09:00:00")
    d2 = pd.Timestamp("2024-07-02 09:00:00")
    d3 = pd.Timestamp("2024-07-08 09:00:00")
    rows = [
        (1, "view", d1), (2, "view", d1), (3, "view", d1), (4, "view", d1),
        (9, "click", d1),
        (4, "view", d2), (5, "view", d2),
        (3, "purchase", d2), (4, "purchase", d2), (6, "purchase", d2),
        (7, "view", d3), (7, "purchase", d3),
    ]
    pd.DataFrame(
        [(i, u, et, ts) for i, (u, et, ts) in enumerate(rows)],
        columns=["event_id", "user_id", "event_type", "ts"],
    ).to_parquet(tmp_path / "events.parquet")

    got = {r.wk: r for r in q_agg_theta_setops(spark, str(tmp_path)).collect()}
    assert set(got) == {27, 28}
    w27 = got[27]
    assert (w27.n_viewers, w27.n_purchasers) == (5, 3)
    assert (w27.n_both, w27.n_view_only, w27.n_partials) == (2, 3, 2)
    w28 = got[28]
    assert (w28.n_viewers, w28.n_purchasers) == (1, 1)
    assert (w28.n_both, w28.n_view_only, w28.n_partials) == (1, 0, 1)


def test_stateful_totals_planted_microbatch_emissions(spark, tmp_path):
    """Drive the exact stateful operator through a REAL three-batch
    availableNow stream and assert every update-mode emission by hand."""
    import os
    import time

    from movie_data_transformer_spark.streaming.stateful import (
        running_user_totals_exact,
    )

    # batch 1 (f1): user 1 view 1.25; user 2 view 0.005 (the half-cent:
    #   floor(0.5 + 0.5) = 1 cent — pandas half-even would emit 0);
    #   user 4 two rows in ONE batch, ts 100 > 90 so 'a' wins in-batch.
    # batch 2 (f2): user 1 purchase 2.50; user 2 purchase 0.015 at the
    #   SAME ts as batch 1's view -> (ts, event_id) tiebreak: eid 11 >
    #   10, 'purchase' takes over; user 3 appears (value 0.0); user 4
    #   late-ish ts 95 < held 100 -> 'a' stays.
    # batch 3 (f3): user 1 view 19.99; user 2 'click' ARRIVES last but
    #   ts 4000 < 5000 -> event-time latest stays 'purchase'.
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    f1 = [(1, 1, 1000, "view", 1.25), (2, 10, 5000, "view", 0.005),
          (4, 30, 100, "a", 1.00), (4, 31, 90, "b", 2.00)]
    f2 = [(1, 2, 2000, "purchase", 2.50), (2, 11, 5000, "purchase", 0.015),
          (3, 20, 7000, "view", 0.0), (4, 32, 95, "c", 1.00)]
    f3 = [(1, 3, 3000, "view", 19.99), (2, 12, 4000, "click", 1.00)]
    src = tmp_path / "stream_src"
    src.mkdir()
    t0 = time.time() - 100
    for i, rows in enumerate((f1, f2, f3)):
        p = src / f"f{i}.parquet"
        pd.DataFrame(rows, columns=cols).to_parquet(p)
        os.utime(p, (t0 + 10 * i, t0 + 10 * i))  # pin batch order

    stream = (
        spark.readStream.schema(
            "user_id BIGINT, event_id BIGINT, ts BIGINT,"
            " event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        running_user_totals_exact(stream)
        .writeStream.format("memory")
        .queryName("r12_stateful_planted")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select * from r12_stateful_planted"
    ).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            (r.n_events, r.sum_value_cents, r.last_event_type)
        )
    for seq in per_user.values():
        seq.sort()  # n_events is strictly increasing per user
    # hand-derived emission ladders (cents: 125/250/1999; 1/2/100):
    assert per_user[1] == [(1, 125, "view"), (2, 375, "purchase"),
                           (3, 2374, "view")]
    assert per_user[2] == [(1, 1, "view"), (2, 3, "purchase"),
                           (3, 103, "purchase")]  # late click never wins
    assert per_user[3] == [(1, 0, "view")]
    assert per_user[4] == [(2, 300, "a"), (3, 400, "a")]
    assert len(rows) == 3 + 3 + 1 + 2  # one emission per touched batch
