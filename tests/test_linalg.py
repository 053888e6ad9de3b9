"""Gram-matrix invariants + the driver-side PCA tail it exists for."""

from __future__ import annotations

import numpy as np

from movie_data_transformer_spark.operators.linalg_queries import (
    DIMS,
    gram_matrix,
    q_emb_gram_matrix,
)
from movie_data_transformer_spark.sources.tables import load_table


def _dense(rows):
    g = np.zeros((DIMS, DIMS), dtype=np.int64)
    for r in rows:
        g[r.i, r.j] = r.gram
        g[r.j, r.i] = r.gram
    return g


def test_gram_matches_numpy_exactly(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    g = _dense(q_emb_gram_matrix(spark, sf_dir).collect())
    v = np.array([r.embedding for r in emb.select("embedding").collect()], dtype=np.float64)
    q = np.floor(v * 1_000_000.0).astype(np.int64)
    assert np.array_equal(g, q.T @ q)  # bit-exact, not approximately


def test_gram_partitioning_invariance(spark, sf_dir):
    """Integer partials make the result independent of how rows are
    sliced into batches/partitions — the property that makes the entry
    full-oracle where float accumulation would be rows-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = _dense(gram_matrix(emb).collect())
    b = _dense(gram_matrix(emb.repartition(7, "vec_id")).collect())
    assert np.array_equal(a, b)


def test_power_iteration_top_component(spark, sf_dir):
    """The O(d^3) tail PCA runs driver-side on the cluster-computed
    Gram: deterministic power iteration (all-ones start) must converge
    to the dominant eigenvector — checked against numpy's full eigen
    decomposition, plus the Rayleigh-quotient optimality bound."""
    g = _dense(q_emb_gram_matrix(spark, sf_dir).collect()).astype(np.float64)

    x = np.ones(DIMS)
    for _ in range(500):
        y = g @ x
        x = y / np.linalg.norm(y)
    lam = x @ g @ x  # Rayleigh quotient at the fixpoint

    w, v = np.linalg.eigh(g)
    assert abs(lam - w[-1]) <= 1e-8 * abs(w[-1])
    top = v[:, -1]
    # geometric convergence at rate (lambda2/lambda1)^k: direction agrees
    # to 1e-4 comfortably; exact equality is not the claim
    assert min(np.linalg.norm(x - top), np.linalg.norm(x + top)) < 1e-4
    # dominant eigenvalue bounds every diagonal entry (variance max)
    assert lam >= g.diagonal().max() - 1e-6 * abs(lam)
