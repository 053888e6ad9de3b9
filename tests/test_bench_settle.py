"""The bench settled verdict is the artifact the driver's BENCH_r{N}
comparison trusts; r9 recorded a 13%-inflated run as settled because a
1-min loadavg of EXACTLY the threshold passed the old inclusive
single-sample check. These tests pin the strict two-consecutive-sample
semantics with a scripted loadavg sequence (no real waiting — sleep and
the deadline clock are monkeypatched), so a refactor that reverts to
`<=` or to a single sample fails here, not in a judge's bench
adjudication."""

from __future__ import annotations

import importlib.util


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_with_loads(monkeypatch, bench, loads, start=1000.0):
    """Drive _wait_for_idle against a scripted 1-min loadavg sequence;
    each sleep(15) advances the fake clock and the sequence (the last
    value repeats once exhausted)."""
    state = {"i": 0, "now": start}

    def fake_loadavg():
        i = min(state["i"], len(loads) - 1)
        return (loads[i], 0.0, 0.0)

    def fake_sleep(s):
        state["now"] += s
        state["i"] += 1

    monkeypatch.delenv("SPARK_GRAFT_BENCH_NO_WAIT", raising=False)
    monkeypatch.setattr(bench.os, "getloadavg", fake_loadavg)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    monkeypatch.setattr(bench.time, "time", lambda: state["now"])
    return bench._wait_for_idle()


def test_boundary_load_of_exactly_threshold_never_settles(monkeypatch):
    """The r9 failure case: a machine pinned at exactly _SETTLE_LOAD
    must NOT report settled — strict `<`, not `<=`."""
    bench = _load_bench()
    assert _run_with_loads(monkeypatch, bench, [bench._SETTLE_LOAD]) is False


def test_one_idle_sample_between_busy_ones_is_not_enough(monkeypatch):
    """A single sub-threshold dip must not settle: the verdict needs two
    CONSECUTIVE idle samples, so busy-idle-busy... never confirms."""
    bench = _load_bench()
    assert _run_with_loads(monkeypatch, bench, [0.5, 2.0] * 40) is False


def test_two_consecutive_idle_samples_settle(monkeypatch):
    """Busy then idle twice in a row -> settled, well inside the cap."""
    bench = _load_bench()
    assert _run_with_loads(monkeypatch, bench, [5.0, 3.0, 0.8, 0.7]) is True


def test_already_idle_start_still_needs_a_confirming_sample(monkeypatch):
    """Idle at entry counts as the first sample; one confirming sample
    15 s later settles. If the confirmation comes back busy, the count
    restarts rather than carrying the stale first sample."""
    bench = _load_bench()
    assert _run_with_loads(monkeypatch, bench, [0.4, 0.4]) is True
    assert _run_with_loads(monkeypatch, bench, [0.4, 1.5, 0.4, 0.4]) is True
    assert _run_with_loads(monkeypatch, bench, [0.4, 1.5]) is False  # never re-idles


def test_no_wait_env_short_circuits_on_strict_compare(monkeypatch):
    """SPARK_GRAFT_BENCH_NO_WAIT skips waiting but still judges the
    single sample strictly."""
    bench = _load_bench()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_NO_WAIT", "1")
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (bench._SETTLE_LOAD, 0.0, 0.0)
    )
    assert bench._wait_for_idle() is False
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.0, 0.0))
    assert bench._wait_for_idle() is True
