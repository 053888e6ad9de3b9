"""Property tests (hypothesis) for the late round-8 algebra: each
property pins a pure-Python mirror of the arithmetic the operators and
their DuckDB oracles share, so an engine-side regression shows up as a
named algebraic break rather than an anonymous hash mismatch."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=100),
    st.lists(st.integers(0, 30), min_size=1, max_size=100),
)
def test_ks_cumulative_formula_equals_ecdf_sup(xs, ys):
    # the operator's |c1*n2 - c2*n1| max over the merged value domain
    n1, n2 = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    d_num = max(
        abs(
            sum(1 for x in xs if x <= v) * n2
            - sum(1 for y in ys if y <= v) * n1
        )
        for v in grid
    )
    # the textbook sup over ALL reals (ECDF only jumps at sample points,
    # so evaluating just after each point covers every x)
    sup = 0.0
    for v in grid:
        f1 = sum(1 for x in xs if x <= v) / n1
        f2 = sum(1 for y in ys if y <= v) / n2
        sup = max(sup, abs(f1 - f2))
    assert abs(d_num / (n1 * n2) - sup) < 1e-12


@given(st.lists(st.booleans(), max_size=200))
def test_islands_rank_trick_equals_run_scan(mask):
    # operator form: distinct (position - rank-within-masked)
    islands = set()
    rank = 0
    for p, m in enumerate(mask, start=1):
        if m:
            rank += 1
            islands.add(p - rank)
    # ground truth: count of runs of consecutive True
    runs = sum(
        1 for i, m in enumerate(mask) if m and (i == 0 or not mask[i - 1])
    )
    assert len(islands) == runs


@given(st.lists(st.integers(0, 3), min_size=1, max_size=30), st.randoms())
def test_ideal_ordering_dominates_dcg(rels, rnd):
    from movie_data_transformer_spark.operators.ranking_eval_queries import (
        DISC_MICRO,
        K,
    )

    def dcg(order):
        return sum(
            (2 ** r - 1) * DISC_MICRO[i] for i, r in enumerate(order[:K])
        )

    ideal = dcg(sorted(rels, reverse=True))
    for _ in range(5):
        perm = rels[:]
        rnd.shuffle(perm)
        assert dcg(perm) <= ideal


@given(
    st.integers(0, 1000),
    st.integers(0, 1000),
    st.integers(1, 2000),
    st.integers(1, 2000),
)
def test_psi_term_nonnegative_and_symmetric(ref_n, cur_n, ref_extra, cur_extra):
    nb = 8
    ref_tot = ref_n + ref_extra
    cur_tot = cur_n + cur_extra
    p = (ref_n + 1) / (ref_tot + nb)
    q = (cur_n + 1) / (cur_tot + nb)
    term = (p - q) * math.log(p / q)
    assert term >= 0.0  # (p-q) and ln(p/q) always share sign
    # swapping reference and current leaves the contribution invariant
    term_swapped = (q - p) * math.log(q / p)
    assert abs(term - term_swapped) < 1e-15


@given(st.lists(st.integers(0, 3), min_size=2, max_size=300))
def test_krippendorff_reduced_form_equals_coincidence_matrix(ks):
    # ks = keep-votes per item, m=3 raters, binary categories
    m = 3
    n = len(ks)
    c1 = sum(ks)
    c0 = n * m - c1
    if c1 == 0 or c0 == 0:
        return
    # operator form (collapsed rational)
    do_num = sum(k * (m - k) for k in ks)
    alpha_op = 1 - do_num * (n * m - 1) / ((m - 1) * c1 * c0)
    # textbook form: Do from within-item pairs, De from the pooled
    # coincidence margins
    do = sum(2 * k * (m - k) for k in ks) / (n * m * (m - 1))
    de = 2 * c1 * c0 / ((n * m) * (n * m - 1))
    alpha_txt = 1 - do / de
    assert abs(alpha_op - alpha_txt) < 1e-9


@given(st.lists(st.integers(1, 50), min_size=1, max_size=25))
def test_truncating_row_stochastic_bound(counts):
    # markov matrix rows: sum of n_i*1e6 // N lands within len(counts)
    # micro of exactly 1e6 (each cell truncates < 1 micro)
    total = sum(counts)
    cells = [c * 1_000_000 // total for c in counts]
    assert 1_000_000 - len(counts) < sum(cells) <= 1_000_000


@settings(max_examples=30)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=100,
    )
)
def test_fkgl_monotone_in_syllable_density(pairs):
    # sanity of the micro formula: adding syllables at fixed words and
    # sentences never lowers the grade
    from tests.test_readability import _trunc_div

    w = max(1, sum(1 for _ in pairs))
    s = max(1, pairs[0][0] or 1)
    y1 = w + sum(p[1] for p in pairs)  # >= one syllable per word
    y2 = y1 + 5
    g1 = _trunc_div(390000 * w, s) + _trunc_div(11800000 * y1, w) - 15590000
    g2 = _trunc_div(390000 * w, s) + _trunc_div(11800000 * y2, w) - 15590000
    assert g2 >= g1


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=12))
def test_sstemmer_is_idempotent_and_never_lengthens(word):
    from tests.test_rater_eval_extras import _sstem_py

    once = _sstem_py(word)
    assert len(once) <= len(word)
    # every rule output ends in y/e/a-non-s char or a protected suffix,
    # so a second pass can only be the identity
    assert _sstem_py(once) == once
