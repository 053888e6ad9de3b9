"""Property tests (hypothesis) for the round-7 algebra: each property
pins the MATH the SQL/DataFrame implementations encode, on arbitrary
inputs far beyond the fixtures — the same oracle-primitive discipline as
test_functions_property.py. Pure Python, no SparkSession."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from("vp"), max_size=60))
def test_fifo_prefix_identity_equals_greedy(seq):
    """matching_queries' closed form: greedy order-respecting matching of
    p's to earlier v's == n_p - max(0, max prefix (p_cnt - v_cnt))."""
    avail = matched = 0
    for t in seq:
        if t == "v":
            avail += 1
        elif avail > 0:
            avail -= 1
            matched += 1
    deficit = mx = 0
    for t in seq:
        deficit += 1 if t == "p" else -1
        mx = max(mx, deficit)
    n_p = seq.count("p")
    assert matched == n_p - max(0, mx)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**7), min_size=1, max_size=200))
def test_type7_integer_interpolation_matches_numpy(xs):
    """robust_stats' tenth-quantile interpolation in exact micro units ==
    numpy's type-7 default, for q in {0.5, 0.9}."""
    import numpy as np

    xs = sorted(xs)
    n = len(xs)
    for q in (5, 9):
        lo_i = (n - 1) * q // 10
        frac10 = (n - 1) * q % 10
        hi_i = min(lo_i + 1, n - 1)
        got = xs[lo_i] * 1_000_000 + (xs[hi_i] - xs[lo_i]) * frac10 * 100_000
        want = round(float(np.quantile(np.asarray(xs, dtype=np.float64), q / 10)) * 1e6)
        assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=30).filter(
        lambda w: sum(w) > 0
    ),
    st.integers(1, 10**6),
)
def test_largest_remainder_apportionment(weights, budget):
    """mixing_queries' Hamilton method: allocations sum to the budget
    exactly and each sits within 1 of the real quota."""
    total = sum(weights)
    base = [budget * w // total for w in weights]
    rem = [budget * w % total for w in weights]
    leftover = budget - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == budget
    for w, a in zip(weights, alloc):
        assert abs(a - budget * w / total) < 1.0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(1, 2**32 - 1), min_size=1, max_size=100),
    st.lists(st.booleans(), min_size=1, max_size=100),
)
def test_kmv_bottomk_union_merge_is_lossless(hashes, parity):
    """sketch_extras' merge identity: bottom-k of the union of per-half
    bottom-k sets == bottom-k of the full distinct hash set."""
    k = 8
    hs = sorted(set(hashes))
    halves = [set(), set()]
    for i, h in enumerate(set(hashes)):
        halves[parity[i % len(parity)]].add(h)
    merged = sorted(sorted(halves[0])[:k] + sorted(halves[1])[:k])
    merged = sorted(set(merged))[:k]
    assert merged == hs[:k]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), max_size=80))
def test_skyline_window_form_equals_naive_dominance(pts):
    """skyline_queries' sort+prefix-max rewrite == the literal dominance
    definition (duplicates survive together)."""

    def dominated(a):
        return any(
            b[0] >= a[0] and b[1] >= a[1] and b != a for b in pts
        )

    naive = sorted(p for p in pts if not dominated(p))

    # window form: group by x, per-group max y, prefix max over strictly
    # greater x; survivor iff richer_max < y and same-x max <= y
    from collections import defaultdict

    gmax = defaultdict(lambda: -1)
    for x, y in pts:
        gmax[x] = max(gmax[x], y)
    xs_desc = sorted(gmax, reverse=True)
    prefix = {}
    run = None
    for x in xs_desc:
        prefix[x] = run
        run = gmax[x] if run is None else max(run, gmax[x])
    window = sorted(
        (x, y)
        for x, y in pts
        if (prefix[x] is None or prefix[x] < y) and gmax[x] <= y
    )
    assert window == naive
