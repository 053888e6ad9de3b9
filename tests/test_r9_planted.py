"""Planted-truth gates for the round-8 analysis families (r08 VERDICT
advice #3: prefer deepening evidence — the DuckDB oracles bind these
entries to the same formulas the engine uses, so a SHARED misreading
would hash-match; these tests plant inputs whose correct output is known
from first principles, independent of both engines).

* scene cuts: a hand-built two-cut AVI (static scenes, one gradual
  change below threshold, two hard cuts) — the cut positions and exact
  per-frame deltas are known by construction, so a frame-order slip,
  channel swap, or off-by-one in the consecutive pairing moves a cut.
* Hill tail index: a deterministic inverse-CDF Pareto(alpha=2) grid
  written to a scratch events.parquet — the estimator must recover the
  planted exponent (the grid's closed-form Hill value is within 0.5% of
  2), which no bookkeeping identity can fake.
"""

from __future__ import annotations

import math

import pandas as pd


def _solid_dib(level_rgb: tuple[int, int, int], w: int, h: int) -> bytes:
    """One uncompressed 24-bit DIB frame of a single solid color
    (bottom-up BGR rows padded to 4 bytes — the layout avi_decode_frames
    expects)."""
    r, g, b = level_rgb
    pad = (-(w * 3)) % 4
    row = bytes((b, g, r)) * w + b"\x00" * pad
    return row * h


def _planted_avi(frames_rgb: list[tuple[int, int, int]], w: int, h: int) -> bytes:
    """Solid-color frames in the SAME container the fixture generator
    assembles (avi_container is the shared header path) — only the frame
    CONTENT is chosen by the test, not by the generative pixel formula."""
    from movie_data_transformer_spark.operators.multimodal import avi_container

    return avi_container([_solid_dib(c, w, h) for c in frames_rgb], w, h)


def test_scene_cuts_find_planted_boundaries(spark):
    """Six solid frames, per-cell levels 0,0,50,250,250,0: deltas per
    cell are 0, 50 (below the 100-milli-mean threshold), 200 (cut), 0,
    250 (cut) — the detector must flag EXACTLY frames 3 and 5 and report
    the exact integer deltas."""
    from movie_data_transformer_spark.operators.multimodal import avi_scene_cuts
    from movie_data_transformer_spark.operators.scene_cut_queries import (
        THRESH_MILLI,
    )

    w, h = 6, 5
    cells = w * h * 3
    levels = [0, 0, 50, 250, 250, 0]
    blob = _planted_avi([(v, v, v) for v in levels], w, h)
    media = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, content binary")
    rows = {r.frame_idx: r for r in avi_scene_cuts(media, THRESH_MILLI).collect()}

    assert set(rows) == {1, 2, 3, 4, 5}  # consecutive pairs only, 0-anchored
    for idx, r in rows.items():
        d = abs(levels[idx] - levels[idx - 1])
        assert r.delta_sum == d * cells  # exact integer pixel arithmetic
        assert r.mean_delta_milli == d * 1000
    assert {i for i, r in rows.items() if r.is_cut} == {3, 5}


def _bmp_from_rgb(rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """A real 24-bit BMP from an explicit pixel grid, assembled by the
    SAME header path the fixture generator uses (bmp_container); the test
    supplies only the bottom-up padded BGR pixel array."""
    from movie_data_transformer_spark.operators.multimodal import bmp_container

    h, w = len(rows_rgb), len(rows_rgb[0])
    pad = (-(w * 3)) % 4
    pixel_data = b"".join(
        b"".join(bytes((b, g, r)) for r, g, b in rows_rgb[yy]) + b"\x00" * pad
        for yy in range(h - 1, -1, -1)
    )
    return bmp_container(pixel_data, w, h)


def test_contrast_screen_on_planted_images(spark):
    """Three images whose variance numerator is known in closed form:
    a flat gray (var_num EXACTLY 0 — any nonzero means the n*s2 - s^2
    identity or the decode is wrong), a near-flat two-level gray (tiny
    but nonzero variance, still low-contrast), and a half-black /
    half-white checker whose var_num is (n^2/4)*(luma_diff)^2 exactly
    and must NOT be flagged."""
    from movie_data_transformer_spark.operators.contrast_queries import (
        VAR_MILLI_THRESH,
    )
    from movie_data_transformer_spark.operators.multimodal import bmp_contrast_stats

    w, h = 5, 4  # odd width exercises row padding
    n = w * h
    flat = [[(100, 100, 100)] * w for _ in range(h)]
    # luma8 = 2r+5g+b: 800 vs 808 -> d=8, var_num = (n^2/4)*64
    nearflat = [
        [(100, 100, 100) if (x + y) % 2 else (101, 101, 101) for x in range(w)]
        for y in range(h)
    ]
    checker = [
        [(0, 0, 0) if (x + y) % 2 else (255, 255, 255) for x in range(w)]
        for y in range(h)
    ]
    media = spark.createDataFrame(
        [
            (1, bytearray(_bmp_from_rgb(flat))),
            (2, bytearray(_bmp_from_rgb(nearflat))),
            (3, bytearray(_bmp_from_rgb(checker))),
        ],
        "doc_id long, content binary",
    )
    got = {
        r.doc_id: r
        for r in bmp_contrast_stats(media, VAR_MILLI_THRESH).collect()
    }

    assert got[1].var_num == 0 and got[1].is_low_contrast == 1
    assert got[1].sum_luma == n * 800

    # n=20 with exactly 10 cells per level -> var_num = (n^2/4) * d^2
    assert got[2].var_num == (n * n // 4) * 8 * 8
    assert got[2].is_low_contrast == 1

    assert got[3].var_num == (n * n // 4) * 2040 * 2040
    assert got[3].is_low_contrast == 0


def test_hill_recovers_planted_pareto_exponent(spark, tmp_path):
    """Deterministic Pareto(alpha=2) grid: x_i = ((i-0.5)/n)^(-1/2) * 100
    for i=1..n. The Hill estimator at k=50 on this grid has closed-form
    value within 0.5% of 1/2, so the reported alpha must land within 5%
    of the planted exponent — and the floor-micro pipeline must agree
    exactly with an independent Python recompute from the cents values."""
    from movie_data_transformer_spark.operators.tailindex_queries import (
        K,
        q_stats_hill_tail_index,
    )

    n = 5000
    vals = [((i - 0.5) / n) ** -0.5 * 100.0 for i in range(1, n + 1)]
    pd.DataFrame(
        {
            "event_id": list(range(n)),
            "event_type": ["pareto2"] * n,
            "ts": pd.to_datetime("2024-01-01"),
            "value": vals,
        }
    ).to_parquet(tmp_path / "events.parquet")

    row = q_stats_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert (row.event_type, row.n, row.k) == ("pareto2", n, K)

    cents = sorted((int(math.floor(v * 100 + 0.5)) for v in vals), reverse=True)
    assert row.xk1_cents == cents[K]
    expected_sum = sum(
        int(math.floor(math.log(c / cents[K]) * 1_000_000)) for c in cents[:K]
    )
    # +/-1 micro slack: JVM Math.log and CPython math.log both wrap the
    # platform libm but are not REQUIRED to agree to the last ULP; a
    # 1-ULP divergence landing exactly on a floor boundary would shift a
    # summed term by 1 micro (K terms -> at most K on the sum -> 1 after
    # the integer division). Exact on this host; the slack only guards
    # other platform/JDK libms (r9 ADVICE low #2).
    assert abs(row.hill_micro - expected_sum // K) <= 1
    alpha = row.alpha_micro / 1e6
    assert abs(alpha - 2.0) < 0.1  # the planted exponent, recovered
