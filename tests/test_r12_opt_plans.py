"""Plan pins for the r12 OPTIMIZATION round's rewrites — the structural
properties each change bought, which a refactor could silently lose
while every oracle stays green (correctness is plan-independent; cost
is not).

Each pin names the commit-level change it guards:
  1. widen-narrow-scans: heavy pre-exchange stages widen a 1-task scan
     (REPARTITION_BY_NUM in the plan at test scale, where scans are
     single-partition; widen_for_compute is a no-op on wide scans).
  2. corpus_pipeline_e2e: canonical keep is ONE digest window — no join,
     no second digest exchange.
  3. join_bloom_prune: candidate generation is k broadcast LEFT SEMI
     probes — the fact side never hash-shuffles before the exact verify.
  4. kmeans_silhouette_fixed: top-2 cells are computed row-locally
     against the 1-row broadcast centroid array — no vector-grain
     (vec_id) exchange.
  5. text_line_dedup_boilerplate: line document-frequency shuffles the
     64-bit xxhash digest, never the line text.
"""

from __future__ import annotations


def _plans(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()

    def plan_of(name):
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_widened_compute_stages(spark, sf_dir):
    """The r12-widened entries repartition their narrow test-scale scan
    before the heavy map stage (decimal partial aggs / tokenize / BPE
    replace chain / 3x CMS hashing / media synthesis)."""
    plan_of = _plans(spark, sf_dir)
    for name in (
        "tpch_q1_pricing_summary",
        "agg_rollup",
        "bpe_encode_fixed",
        "agg_cms_heavy_hitters",
        "text_rake_keywords",
        "dsir_topk_selection",
        "text_line_dedup_boilerplate",
        "corpus_pipeline_e2e",
        "mm_audio_window_energy",
    ):
        assert "REPARTITION_BY_NUM" in plan_of(name), name


def test_corpus_pipeline_single_digest_pass(spark, sf_dir):
    """Canonical keep = one row_number window over dg: exactly one
    digest exchange, and no join anywhere in the pipeline."""
    p = _plans(spark, sf_dir)("corpus_pipeline_e2e")
    assert p.count("hashpartitioning(dg") == 1, p[:800]
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in p, bad


def test_bloom_probe_is_fact_shuffle_free(spark, sf_dir):
    """Candidate generation = k broadcast left-semi probes: the fact
    (orders) side must not hash-shuffle before the exact verify — no
    o_orderkey exchange (the old explode+join+group-count probe's
    signature), and the semi probes are broadcast joins."""
    p = _plans(spark, sf_dir)("join_bloom_prune")
    assert "hashpartitioning(o_orderkey" not in p
    assert p.count("BroadcastHashJoin") >= 3  # the k=3 position probes
    assert "CartesianProduct" not in p


def test_silhouette_rowlocal_top2(spark, sf_dir):
    """Top-2 cells per vector are computed row-locally against the
    broadcast centroid array: no vec_id exchange (the old n x k
    collect_list shuffle), and only the per-cell aggregate shuffles."""
    p = _plans(spark, sf_dir)("kmeans_silhouette_fixed")
    assert "hashpartitioning(vec_id" not in p
    assert "CartesianProduct" not in p


def test_line_dedup_shuffles_digest_not_text(spark, sf_dir):
    """Line document-frequency groups on the 64-bit xxhash64 digest; the
    line text itself never keys an exchange."""
    p = _plans(spark, sf_dir)("text_line_dedup_boilerplate")
    assert "hashpartitioning(_line_key" in p
    assert "hashpartitioning(line" not in p


def test_incremental_minhash_batch_fork_points_cached(spark, sf_dir):
    """The batch shingle-set and band tables are persisted: the plan
    embeds InMemoryRelations instead of re-deriving the tokenize+
    shingle+signature lineage per reference."""
    p = _plans(spark, sf_dir)("dedup_incremental_minhash")
    assert "InMemoryRelation" in p
