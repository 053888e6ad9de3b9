"""Pins for emb_norm_stats (numpy recompute on the micro-quantized
grid) and stream_psi_monitor == score_psi_bins (slicing invariance)."""

from __future__ import annotations

import math
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from movie_data_transformer_spark.operators.embnorm_queries import (
    q_emb_norm_stats,
)
from movie_data_transformer_spark.operators.psi_queries import q_score_psi_bins
from movie_data_transformer_spark.operators.psi_stream_queries import (
    q_stream_psi_monitor,
)
from movie_data_transformer_spark.sources.tables import load_table


def test_emb_norm_stats_matches_python(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").collect()
    by_label = defaultdict(list)
    for r in vecs:
        q = [math.floor(float(x) * 1_000_000) for x in r.embedding]
        by_label[r.label].append(sum(v * v for v in q))
    got = {r.label: r for r in q_emb_norm_stats(spark, sf_dir).collect()}
    assert set(got) == set(by_label)
    for label, norms in by_label.items():
        row = got[label]
        assert row.n_vecs == len(norms)
        assert row.mean_normsq == sum(norms) // len(norms)
        assert row.min_normsq == min(norms)
        assert row.max_normsq == max(norms)
        assert row.n_near_zero == sum(1 for v in norms if v < 10_000_000_000)


def test_stream_psi_equals_batch(spark, sf_dir):
    batch = {
        r.bin: (r.ref_n, r.cur_n, r.psi_term_micro)
        for r in q_score_psi_bins(spark, sf_dir).collect()
    }
    stream = {
        r.bin: (r.ref_n, r.cur_n, r.psi_term_micro)
        for r in q_stream_psi_monitor(spark, sf_dir).collect()
    }
    assert stream == batch
