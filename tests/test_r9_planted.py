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
import struct

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
    """A minimal RIFF/AVI container holding solid-color frames — the same
    chunk helpers the fixture generator uses, but with frame CONTENT
    chosen by the test, not by the generative pixel formula."""
    from movie_data_transformer_spark.operators.multimodal import (
        _chunk,
        _list_chunk,
    )

    n = len(frames_rgb)
    frame_bytes = (w * 3 + ((-(w * 3)) % 4)) * h
    avih = struct.pack(
        "<14I", 40000, frame_bytes * 25, 0, 0x10, n, 0, 1, frame_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<I", 0)
        + struct.pack("<2H", 0, 0)
        + struct.pack("<8I", 0, 1, 25, 0, n, frame_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = _list_chunk(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list_chunk(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list_chunk(
        b"movi",
        b"".join(_chunk(b"00db", _solid_dib(c, w, h)) for c in frames_rgb),
    )
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


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
    assert row.hill_micro == expected_sum // K
    alpha = row.alpha_micro / 1e6
    assert abs(alpha - 2.0) < 0.1  # the planted exponent, recovered
