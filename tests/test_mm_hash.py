"""dHash goldens on constructed BMPs: gradient/flat extremes and the
brightness-shift invariance that makes a DIFFERENCE hash a perceptual
hash (absolute-level changes don't flip comparison bits)."""

from __future__ import annotations

import struct

import numpy as np

from movie_data_transformer_spark.operators.mm_hash_queries import (
    DH_H,
    DH_W,
    dhash_rows,
)


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP from an (h, w, 3) RGB uint8 array —
    same container layout synthesize_bmp_media emits."""
    h, w = img.shape[:2]
    pad = (-(w * 3)) % 4
    rows = []
    for yy in range(h - 1, -1, -1):
        px = img[yy][:, ::-1].astype(np.uint8)  # BGR on disk
        rows.append(px.tobytes() + b"\x00" * pad)
    pixel_data = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + dib + pixel_data


def _hashes(spark, images):
    media = spark.createDataFrame(
        [(i, bytearray(_bmp_bytes(img))) for i, img in enumerate(images)],
        "doc_id long, content binary",
    )
    return {
        r.doc_id: (r.hash_hi, r.hash_lo) for r in dhash_rows(media).collect()
    }


def _gradient(shift: int = 0) -> np.ndarray:
    # strictly increasing left->right luma; +shift clipped under 255
    img = np.zeros((16, 20, 3), dtype=np.uint8)
    img[:, :, :] = (np.arange(20) * 10 + shift)[None, :, None]
    return img


def test_dhash_extremes_and_shift_invariance(spark):
    all_ones = (1 << 32) - 1  # every comparison bit set, per 32-bit half
    hs = _hashes(
        spark,
        [
            _gradient(),  # 0: strictly increasing -> all bits 1
            np.full((12, 12, 3), 77, dtype=np.uint8),  # 1: flat -> all 0
            _gradient(shift=40),  # 2: brightness-shifted gradient
        ],
    )
    assert hs[0] == (all_ones, all_ones)
    assert hs[1] == (0, 0)
    # difference hash ignores uniform brightness shifts
    assert hs[2] == hs[0]


def test_dhash_small_edit_small_hamming(spark):
    """Perturbing one sampled cell flips at most its two adjacent
    comparison bits — near-dup images stay within a tiny Hamming
    distance while a reversed gradient is maximally far."""
    base = _gradient()
    edited = base.copy()
    edited[0:2, 6:8, :] = 255  # a local blotch
    reversed_ = base[:, ::-1, :].copy()
    hs = _hashes(spark, [base, edited, reversed_])

    def ham(a, b):
        return bin((a[0] ^ b[0]) << 32 | (a[1] ^ b[1])).count("1")

    assert 0 < ham(hs[0], hs[1]) <= 4
    assert ham(hs[0], hs[2]) == DH_W * DH_H  # every comparison flips


def test_dhash_near_pairs_find_all_planted_copies(spark, sf_dir):
    """Every planted byte-identical copy (doc < 50 re-labeled +300000)
    must surface as a hamming-0 pair with its original — banding cannot
    lose a hamming-0 pair (all four bands agree)."""
    from movie_data_transformer_spark.operators.mm_hash_queries import (
        q_mm_dhash_near_pairs,
    )

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q_mm_dhash_near_pairs(spark, sf_dir).collect()
    }
    for i in range(50):
        assert pairs.get((i, i + 300000)) == 0, i


def test_image_dedup_pipeline_drops_all_planted_copies(spark, sf_dir):
    """Composed-pipeline sanity: totals include the 50 planted copies,
    every copy is dropped (its original has a lower id at hamming 0),
    and the per-dimension partition n_kept + n_dropped == n_total."""
    from movie_data_transformer_spark.operators.mm_hash_queries import (
        q_mm_image_dedup_pipeline,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    rows = q_mm_image_dedup_pipeline(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_total for r in rows) == n_docs + 50
    assert all(r.n_kept + r.n_dropped == r.n_total for r in rows)
    assert sum(r.n_dropped for r in rows) >= 50  # every planted copy gone


def test_dhash_banding_pigeonhole_property():
    """Pure-math recall guarantee of the 4x16-bit banding: ANY two
    64-bit hashes within Hamming distance 3 agree on at least one band
    (<= 3 flipped bits cannot touch all 4 disjoint 16-bit bands).
    Deterministic sweep over structured flip patterns."""
    import itertools

    def bands(hi, lo):
        return (lo & 0xFFFF, (lo >> 16) & 0xFFFF, hi & 0xFFFF, (hi >> 16) & 0xFFFF)

    base_hi, base_lo = 0x9E3779B9, 0x7F4A7C15
    positions = [0, 1, 15, 16, 17, 31, 32, 33, 47, 48, 62, 63]
    for k in (1, 2, 3):
        for flips in itertools.combinations(positions, k):
            hi, lo = base_hi, base_lo
            for p in flips:
                if p < 32:
                    lo ^= 1 << p
                else:
                    hi ^= 1 << (p - 32)
            shared = sum(
                a == b for a, b in zip(bands(base_hi, base_lo), bands(hi, lo))
            )
            assert shared >= 1, flips
    # and 4 flips spread across all bands CAN break every band (the
    # guarantee is tight at hamming <= 3)
    hi, lo = base_hi ^ (1 << 0) ^ (1 << 31), base_lo ^ (1 << 0) ^ (1 << 31)
    assert all(a != b for a, b in zip(bands(base_hi, base_lo), bands(hi, lo)))


def test_avi_scene_cuts_cover_all_pairs_and_vary(spark, sf_dir):
    from movie_data_transformer_spark.operators.scene_cut_queries import (
        q_mm_avi_scene_cuts,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    rows = q_mm_avi_scene_cuts(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == n_docs
    for doc_id, group in by_doc.items():
        nf = 2 + doc_id % 4
        assert sorted(r.frame_idx for r in group) == list(range(1, nf))
        for r in group:
            cells = (4 + doc_id % 8) * (4 + doc_id % 6) * 3
            assert r.mean_delta_milli == r.delta_sum * 1000 // cells
            assert r.is_cut == int(r.mean_delta_milli >= 100_000)
    # the planted pixel walk produces BOTH cut and non-cut transitions
    flags = {r.is_cut for r in rows}
    assert flags == {0, 1}


def test_bmp_contrast_flags_balanced_and_exact(spark, sf_dir):
    from movie_data_transformer_spark.operators.contrast_queries import (
        VAR_MILLI_THRESH,
        q_mm_bmp_contrast_stats,
    )

    rows = q_mm_bmp_contrast_stats(spark, sf_dir).collect()
    assert rows
    flags = [r.is_low_contrast for r in rows]
    assert set(flags) == {0, 1}  # the median threshold splits the corpus
    for r in rows:
        # planted-formula recompute of one invariant: the flag is the
        # cross-multiplied comparison, no hidden division
        assert r.is_low_contrast == int(
            r.var_num * 1000 < VAR_MILLI_THRESH * r.n_px * r.n_px
        )
        assert r.var_num >= 0


def test_phash_dct_structure(spark, sf_dir):
    from movie_data_transformer_spark.operators.multimodal import COS8_MICRO
    from movie_data_transformer_spark.operators.phash_queries import (
        q_mm_bmp_phash_dct,
    )

    import math

    # the planted basis IS the DCT-II basis at micro precision
    for k in range(8):
        for x in range(8):
            want = round(math.cos(math.pi * (2 * x + 1) * k / 16) * 1_000_000)
            assert COS8_MICRO[k][x] == want

    rows = q_mm_bmp_phash_dct(spark, sf_dir).collect()
    assert rows
    hashes = set()
    for r in rows:
        assert 0 <= r.phash < (1 << 15)
        # median splits the 15 AC coefficients: 7 strictly above at most
        # (the > comparison), so popcount <= 7
        assert bin(r.phash).count("1") <= 7
        assert r.dc_coeff > 0  # luma is positive, k=l=0 basis is all +1e6
        hashes.add(r.phash)
    # the fixture's varied pixel walks produce many distinct fingerprints
    assert len(hashes) > len(rows) // 10


def test_audio_silence_segments_consistent(spark, sf_dir):
    from movie_data_transformer_spark.operators.mm_transform_queries import (
        q_mm_audio_window_energy,
    )
    from movie_data_transformer_spark.operators.vad_queries import (
        THRESH_SQ,
        q_mm_audio_silence_segments,
    )

    wins = {}
    for r in q_mm_audio_window_energy(spark, sf_dir).collect():
        wins.setdefault(r.doc_id, []).append(
            (r.window_idx, int(r.energy < THRESH_SQ * r.n_samples))
        )
    got = {r.doc_id: r for r in q_mm_audio_silence_segments(spark, sf_dir).collect()}
    assert set(got) == set(wins)
    saw_silent = saw_loud = False
    for doc_id, ws in wins.items():
        ws.sort()
        flags = [f for _, f in ws]
        n_silent = sum(flags)
        runs = []
        cur = 0
        for f in flags:
            if f:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        row = got[doc_id]
        assert row.n_windows == len(flags)
        assert row.n_silent == n_silent
        assert row.n_segments == len(runs)
        assert row.longest_silence == (max(runs) if runs else 0)
        saw_silent |= n_silent > 0
        saw_loud |= n_silent < len(flags)
    assert saw_silent and saw_loud  # the threshold genuinely splits
