"""Property-based tests (hypothesis) for the LWW merge — the invariants
that must hold for ANY input, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from movie_data_transformer_spark.operators.merge import merge_flat
from movie_data_transformer_spark.schemas import RATING_FLAT

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from movie_data_transformer_spark.session import get_spark

        _spark = get_spark("pytest")
    return _spark


dates = st.sampled_from(
    ["2024-01-01", "2024-02-15", "2024-03-30", "garbage", "2024-12-31"]
)
keys = st.tuples(st.sampled_from(["m1", "m2"]), st.sampled_from(["c1", "c2"]))
rating_rows = st.lists(
    st.tuples(keys, st.integers(1, 5), dates), min_size=0, max_size=6
)


def _df(rows):
    data = [(m, f"T_{m}", 2000, c, r, d) for ((m, c), r, d) in rows]
    return _get_spark().createDataFrame(data, RATING_FLAT)


def _as_map(df):
    return {(r["customerId"], r["movieId"]): (r["rating"], r["date"]) for r in df.collect()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(state=rating_rows, batch=rating_rows)
def test_merge_invariants(state, batch):
    out = _as_map(merge_flat(_df(state), _df(batch)))
    state_keys = {(c, m) for ((m, c), _, _) in state}
    batch_keys = {(c, m) for ((m, c), _, _) in batch}
    # 1. output key set == union of input key sets (no loss, no invention)
    assert set(out) == state_keys | batch_keys
    # 2. every output value existed in one of the inputs (no fabrication)
    pool = {((c, m), r, d) for ((m, c), r, d) in state + batch}
    for (c, m), (r, d) in out.items():
        assert ((c, m), r, d) in pool
    # 3. batch-only keys come from the batch; state-only keys from state
    for key in batch_keys - state_keys:
        assert key in out
    # 4. a state row can never be replaced by a batch row with a
    #    malformed date
    for (c, m), (r, d) in out.items():
        if key_in := ((c, m) in state_keys and (c, m) in batch_keys):
            batch_dates = [bd for ((bm, bc), _, bd) in batch if (bc, bm) == (c, m)]
            if all(bd == "garbage" for bd in batch_dates):
                state_vals = {
                    (sr, sd) for ((sm, sc), sr, sd) in state if (sc, sm) == (c, m)
                }
                assert (r, d) in state_vals


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rating_rows)
def test_dedup_latest_invariants(rows):
    from datetime import date

    from movie_data_transformer_spark.operators.movie_pipeline import dedup_latest

    out = dedup_latest(_df(rows)).collect()
    # exactly one survivor per (customer, movie) key present in the input
    keys_in = {(c, m) for ((m, c), _, _) in rows}
    keys_out = [(r["customerId"], r["movieId"]) for r in out]
    assert sorted(set(keys_out)) == sorted(keys_in) and len(keys_out) == len(set(keys_out))
    # the winner's parsed date is the max parseable date of its key group
    def parse(d):
        try:
            return date.fromisoformat(d)
        except ValueError:
            return None

    for r in out:
        group = [
            (rt, dt) for ((m, c), rt, dt) in rows if (c, m) == (r["customerId"], r["movieId"])
        ]
        parseable = [parse(d) for _, d in group if parse(d) is not None]
        if parseable:
            assert parse(r["date"]) == max(parseable)
        else:
            assert parse(r["date"]) is None  # all-malformed group keeps a malformed row


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=rating_rows)
def test_merge_self_idempotent(batch):
    # merging a deduped batch into itself changes nothing (ties keep
    # existing)
    from movie_data_transformer_spark.operators.movie_pipeline import dedup_latest

    deduped = dedup_latest(_df(batch))
    once = _as_map(deduped)
    twice = _as_map(merge_flat(deduped, deduped))
    assert once == twice
