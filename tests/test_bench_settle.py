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
from pathlib import Path

# derived from the test's own location so the suite works from any
# checkout path (r10 ADVICE low #1)
_BENCH_PATH = Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
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


# ---------------------------------------------------------------------
# r10 VERDICT advice #2/#3: per-query spread self-extension and
# round-over-round outlier re-time selection. The timing helpers are
# driven with a fake Spark/query surface and a scripted clock (no real
# Spark), pinning: 3-run median when the spread is tight, automatic
# extension to median-of-5 when the 3-run spread exceeds 0.25, and the
# worst-delta-first capped retime selection.
# ---------------------------------------------------------------------


class _FakeWriter:
    def format(self, *_):
        return self

    def mode(self, *_):
        return self

    def save(self):
        pass


class _FakeDF:
    write = _FakeWriter()


class _FakeCatalog:
    def clearCache(self):
        pass


class _FakeSpark:
    catalog = _FakeCatalog()


def _drive_time_query(monkeypatch, bench, durations):
    """Run _time_query with a scripted clock: the i-th timed run takes
    durations[i] seconds (the warm-up run consumes no scripted time —
    it is not wrapped in a timer)."""
    state = {"now": 0.0, "i": -1}  # -1: first timed run starts at t0 call 0

    calls = {"n": 0}

    def fake_time():
        # _time_query calls time.time() twice per timed run: t0 then
        # the implicit end via (time.time() - t0). Advance the clock by
        # the scripted duration between the two calls.
        calls["n"] += 1
        if calls["n"] % 2 == 1:  # t0 of run k
            state["i"] += 1
            return state["now"]
        state["now"] += durations[min(state["i"], len(durations) - 1)]
        return state["now"]

    monkeypatch.setattr(bench.time, "time", fake_time)
    qs = {"q": lambda spark, sf: _FakeDF()}
    return bench._time_query(_FakeSpark(), qs, "q", "/nonexistent")


def test_tight_spread_stays_at_three_runs(monkeypatch):
    """Runs 1.0/1.1/1.0: spread 0.1 <= 0.25, median-of-3, no extension."""
    bench = _load_bench()
    med, spread, n, _cold = _drive_time_query(
        monkeypatch, bench, [1.0, 1.1, 1.0, 1.0]
    )
    assert n == 3
    assert med == 1.0
    assert spread == 0.1


def test_wide_spread_extends_to_five_runs(monkeypatch):
    """Runs 1.0/1.0/2.0 spread 1.0 > 0.25 -> two more runs; the final
    median/spread are computed over all five."""
    bench = _load_bench()
    med, spread, n, _cold = _drive_time_query(
        monkeypatch, bench, [1.0, 1.0, 2.0, 1.0, 1.0, 1.0]
    )
    assert n == 5
    assert med == 1.0
    assert spread == 1.0  # (2.0 - 1.0) / 1.0 over the five runs


def test_five_run_base_never_extends(monkeypatch):
    """base_runs=5 (the end-of-suite retime) takes its median-of-5
    directly even when the spread is wide."""
    bench = _load_bench()
    state = {"now": 0.0}
    durations = iter([1.0, 3.0, 1.0, 1.0, 1.0, 1.0])
    seq = {"pending": None}

    def fake_time():
        if seq["pending"] is None:
            seq["pending"] = next(durations)
            return state["now"]
        state["now"] += seq["pending"]
        seq["pending"] = None
        return state["now"]

    monkeypatch.setattr(bench.time, "time", fake_time)
    qs = {"q": lambda spark, sf: _FakeDF()}
    med, spread, n, _cold = bench._time_query(
        _FakeSpark(), qs, "q", "/nonexistent", base_runs=5
    )
    assert n == 5
    assert med == 1.0


def test_retime_selection_worst_first_and_capped():
    """Only >_RETIME_RATIO regressions select; ordered worst delta first; capped
    at _RETIME_MAX; missing/zero priors never select."""
    bench = _load_bench()
    prior = {f"q{i}": 1.0 for i in range(12)}
    prior["zero"] = 0.0
    timings = {f"q{i}": 1.0 + 0.2 * i for i in range(12)}  # q3.. exceed 1.5x
    timings["zero"] = 9.9  # zero prior: never selected
    timings["new_query"] = 9.9  # no prior: never selected
    got = bench._select_retimes(timings, prior)
    assert got[0] == "q11"  # worst delta first
    assert "zero" not in got and "new_query" not in got
    assert len(got) == bench._RETIME_MAX
    assert all(timings[n] / prior[n] > bench._RETIME_RATIO for n in got)


def test_retime_selection_empty_when_within_ratio():
    bench = _load_bench()
    assert bench._select_retimes({"a": 1.25}, {"a": 1.0}) == []


def test_latest_recorded_unwraps_driver_tail(tmp_path):
    """The driver's BENCH_r{N}.json embeds bench's printed JSON line in
    a 'tail' string; _latest_recorded must unwrap the newest round's
    line (and prefer higher round numbers)."""
    import json

    bench = _load_bench()
    inner = {"metric": "m", "value": 1.5, "unit": "sec",
             "queries": {"q1": 1.5}, "sf": 0.1}
    (tmp_path / "BENCH_r2.json").write_text(json.dumps(
        {"rc": 0, "sf": 0.1, "tail": "noise\r\x1b[2K" + json.dumps(inner) + "\n"}
    ))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"rc": 0, "sf": 0.1,
         "tail": json.dumps({**inner, "queries": {"q1": 9.0}})}
    ))
    got, rnd = bench._latest_recorded(str(tmp_path))
    assert rnd == 10
    assert got["queries"] == {"q1": 9.0}
    assert got["sf"] == 0.1


def test_latest_recorded_handles_absent_and_malformed(tmp_path):
    import json

    bench = _load_bench()
    assert bench._latest_recorded(str(tmp_path)) == (None, None)
    (tmp_path / "BENCH_r1.json").write_text(json.dumps({"tail": "no json here"}))
    assert bench._latest_recorded(str(tmp_path)) == (None, None)


def test_latest_recorded_falls_back_past_unparseable_newest(tmp_path):
    """The r11 failure shape: the newest artifact's tail holds only a
    mid-JSON fragment of the embedded reference baseline (no parseable
    run), so the comparison must fall back to the next-older parseable
    round instead of silently disabling retimes (r11 VERDICT wrong #2)."""
    import json

    bench = _load_bench()
    inner = {"metric": "m", "value": 1.5, "unit": "sec",
             "queries": {"q1": 1.5}, "sf": 0.1}
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"rc": 0, "sf": 0.1, "tail": json.dumps(inner)}
    ))
    # r11-shaped: the 2000-char tail cut mid-way through the ~11KB line,
    # leaving an unparseable fragment
    (tmp_path / "BENCH_r11.json").write_text(json.dumps(
        {"rc": 0, "sf": 0.1, "parsed": None,
         "tail": json.dumps(inner)[:-30] + ', "reference_runs": {"ro'}
    ))
    got, rnd = bench._latest_recorded(str(tmp_path))
    assert rnd == 10
    assert got["queries"] == {"q1": 1.5}


def test_unwrap_tail_skips_queryless_metric_objects():
    """A nested object that happens to start with a "metric" key (e.g.
    inside an embedded reference blob) must not be mistaken for the
    measurement: only an object carrying a "queries" dict counts, and
    earlier occurrences are tried when the last one fails (r11 ADVICE
    low #1)."""
    import json

    bench = _load_bench()
    real = {"metric": "m", "value": 1.0, "unit": "sec",
            "queries": {"q1": 1.0}, "sf": 0.1}
    decoy = {"metric": "nested", "note": "no queries dict here"}
    tail = json.dumps(real) + "\nlog noise " + json.dumps(decoy) + "\n"
    got = bench._unwrap_tail(tail)
    assert got["queries"] == {"q1": 1.0}
    # trailing garbage after the real line must not break raw_decode
    assert bench._unwrap_tail(json.dumps(real) + "\x1b[2K partial {") \
        ["queries"] == {"q1": 1.0}
    assert bench._unwrap_tail(json.dumps(decoy)) is None


def test_latest_recorded_excludes_current_round(tmp_path):
    """A re-run after the driver already wrote this round's artifact
    must not compare the run against itself (r11 ADVICE low #4): rounds
    >= exclude_round are skipped."""
    import json

    bench = _load_bench()
    for n, t in ((11, 1.0), (12, 9.0)):
        (tmp_path / f"BENCH_r{n}.json").write_text(json.dumps(
            {"metric": "m", "value": t, "unit": "sec",
             "queries": {"q1": t}, "sf": 0.1}
        ))
    got, rnd = bench._latest_recorded(str(tmp_path), exclude_round=12)
    assert rnd == 11 and got["queries"] == {"q1": 1.0}
    got, rnd = bench._latest_recorded(str(tmp_path))
    assert rnd == 12


def test_retime_ties_break_on_ascending_name():
    """Equal regression ratios order by ascending query name, so a cap
    cutting between tied entries is deterministic and conventional
    (r11 ADVICE low #2)."""
    bench = _load_bench()
    prior = {"zz": 1.0, "aa": 1.0, "mm": 1.0, "big": 1.0}
    timings = {"zz": 2.0, "aa": 2.0, "mm": 2.0, "big": 3.0}
    assert bench._select_retimes(timings, prior) == ["big", "aa", "mm", "zz"]


def test_reference_medians_fallback_shape():
    """BENCH_REFERENCE.json runs collapse to per-query medians at a
    single sf; mixed-sf references are rejected rather than blended."""
    bench = _load_bench()
    ref = {"round": 12, "runs": [
        {"sf": 0.1, "queries": {"q1": 1.0, "q2": 5.0}},
        {"sf": 0.1, "queries": {"q1": 3.0, "q2": 4.0}},
    ]}
    got = bench._reference_medians(ref)
    assert got["sf"] == 0.1
    assert got["queries"] == {"q1": 3.0, "q2": 5.0}  # upper median
    ref["runs"][1]["sf"] = 0.01
    assert bench._reference_medians(ref) is None
    assert bench._reference_medians(None) is None
    assert bench._reference_medians({"runs": []}) is None


def test_reference_staleness_policy():
    """A wrong-sf run or an out-of-date regeneration round marks the
    reference stale (r11 ADVICE low #3); the round check only engages
    when the caller knows the current round, and same-or-previous-round
    references are fresh (the builder regenerates in-session, so the
    driver's run one round later still sees a fresh file)."""
    bench = _load_bench()
    fresh = {"round": 12, "runs": [{"sf": 0.1, "queries": {"q": 1.0}}]}
    assert bench._reference_is_stale(fresh, 0.1, 12) is False
    assert bench._reference_is_stale(fresh, 0.1, 13) is False  # prev round
    assert bench._reference_is_stale(fresh, 0.1, 14) is True  # 2 rounds old
    assert bench._reference_is_stale(fresh, 0.01, 12) is True  # wrong sf
    assert bench._reference_is_stale(fresh, 0.1, None) is False  # no round
    assert bench._reference_is_stale(None, 0.1, 12) is False  # no reference
    mixed = {"round": 12, "runs": [{"sf": 0.1}, {"sf": 0.01}]}
    assert bench._reference_is_stale(mixed, 0.1, None) is True


def test_final_line_fits_driver_tail_budget():
    """r11 VERDICT wrong #1: the driver captures a 2000-char stdout
    tail; the FINAL measurement line must stay under _FINAL_LINE_BUDGET
    with the REAL headline set (representative worst-case float widths),
    or BENCH_r{N}.json records parsed:null again."""
    import json

    bench = _load_bench()
    timings = {name: 12.345 for name in bench.HEADLINE}
    line = bench._slim_line(timings, 0.1, 6.28, 5.61, True, 2)
    assert len(line) < bench._FINAL_LINE_BUDGET
    assert bench._FINAL_LINE_BUDGET + 100 <= 2000  # margin inside capture
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_runtime"
    assert rec["queries"] == timings
    assert set(rec) == {"metric", "value", "unit", "queries", "sf",
                        "loadavg_1m", "settled", "passes"}
