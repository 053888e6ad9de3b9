"""Results must be IDENTICAL under any partitioning / shuffle width —
the reproducibility property that makes the engine trustworthy on a
1000-executor cluster (floating-point partial-agg order, window ties,
and hash-bucket assignment are the classic ways engines silently lose
it). Runs the most order-sensitive registry entries at shuffle widths
3 and 32 and requires bit-identical sorted results."""

from __future__ import annotations

import pytest

ENTRIES = [
    "events_ewma",  # IEEE left-fold — order pinned by design
    "stats_corr_by_year",  # exact decimal partials
    "tpch_q1_pricing_summary",  # decimal sums + deterministic_avg
    "dedup_minhash_lsh",  # hash buckets + pair expansion
    "training_shards",  # window over hash total order
    "events_value_mad_outliers",  # percentile interpolation
    "agg_quantile_sketch",  # grid partials merge
    "agg_cms_heavy_hitters",  # sketch partials merge
    "cogroup_asof_match",  # per-key pandas merge_asof via cogroup
    "text_line_dedup_boilerplate",  # line-df threshold + ordered reassembly
    "search_bm25_topk",  # integer micro scores + rank tiebreak
    "search_phrase_match",  # group-by-start adjacency counting
    # fifth-session additions
    "ccnet_lm_buckets",  # global ntile terciles over micro scores
    "stats_spearman_by_year",  # total-order ranks -> sum(d^2)
    "corpus_pipeline_e2e",  # digest min-id canonical + hash shards
    "bigram_pmi_topk",  # micro-PMI top-k tiebreak
    "key_skew_profile",  # TakeOrdered top-5 + reused count exchange
    "assoc_rules_topk",  # micro-lift top-k tiebreak over basket joins
    "emb_matryoshka_topk",  # integer dot ranking windows
    "window_running_distinct",  # collect_set over an ordered frame
    # round-6 additions
    "emb_gram_matrix",  # integer matmul partials merged by (i, j)
    "dedup_containment",  # df cap + min-size micro quotient
    "dedup_exact_substr_runs",  # diagonal-islands streaks over a join
    "mm_dhash_near_pairs",  # banded buckets + hamming verify
    "classifier_kappa",  # signed trunc-DIV over joined counts
    "score_quantile_normalize",  # two rank windows + rank equi-join
    "events_holt_winters_daily",  # IEEE fold over array_sort'ed series
    "session_concurrency_steps",  # sweep-line running sum
    "text_rake_keywords",  # islands + instance scores + top-k ties
    "emb_int8_retrieval_e2e",  # reconstruction + integer dot ranking
    # round-6 continuation additions
    "dedup_ppjoin_prefix",  # df-order prefixes + micro-jaccard verify
    "dedup_cdc_chunks",  # rolling-hash boundaries + chunk-hash agg
    "stats_theil_sen_by_year",  # trunc-micro slope rank + tiebreaks
    "events_funnel_conversion",  # chained min-aggs + over-() share
    "graph_local_clustering",  # oriented triangles + degree join
    "source_token_tv_drift",  # shared-token join + union completion
    "customers_rfm_scores",  # three ntile windows over total orders
    "stats_weighted_median_by_year",  # crossing-row cumulative window
    "events_changepoint_day",  # rational argmax via trunc-micro rank
    "attribution_position_based",  # largest-remainder credit split
    "text_feature_hashing",  # hash-mod dims + md5-bound dense fold
    "join_skew_hot_cold",  # hot/cold routing must not change results
    "emb_kcenter_coreset",  # greedy argmax sequence with id tiebreaks
    "dedup_sorted_neighborhood",  # global sort + rank-window candidates
    "search_hybrid_rrf",  # two rankings + integer rank fusion
    "events_daily_acf",  # decimal remainder-subtract micro floors
    "events_rolling_trend",  # RANGE-window integer sums
    "events_seasonal_outliers",  # cross-multiplied variance test
    "dedup_impact_report",  # composes three order-sensitive tiers
    "customer_migration_matrix",  # per-half ntile terciles
    "revenue_share_hierarchy",  # parent-share windows
    "stats_poisson_bootstrap_ci",  # hash multiplicities + order stats
    "mm_histogram_equalize",  # per-image cdf mapping
    # round-8 additions (matrix extended r9 — the order-sensitive subset:
    # rank windows with tiebreaks, floor-micro ln/log folds, iterative
    # pooling, greedy top-k)
    "dsir_topk_selection",  # global top-k over broadcast-joined LLR micros
    "search_ndcg_at_k",  # two rank windows + planted micro discounts
    "stats_ks_two_sample",  # cumulative rank counts -> exact rational D max
    "calibration_isotonic_fit",  # PAVA pooling sequence
    "stats_krippendorff_alpha",  # label-pair coincidence folds
    "events_markov_user_typicality",  # (user,from,to)-grain + matrix join
    "text_zipf_fit",  # per-lang rank windows + one log10 fold
    "stats_hill_tail_index",  # top-(k+1) rank window + floor-micro ln sum
    "text_entropy_rate_by_lang",  # unigram/bigram folds, ln once per type
    "asof_nearest_view_purchase",  # union stream + two fill windows + ties
    "pref_pairs_build",  # rank-1 slices joined on shared partitioning
    "semdedup_ann_recall",  # integer centroids -> cell assign -> recall
    # round-10 additions (matrix extended r10 — the r7-addition families'
    # order-sensitive subset entering the driver window this round:
    # sequential state machines, cumulative-distinct curves, global order
    # statistics, largest-remainder apportionment, top-k tiebreaks)
    "movies_item_item_topk",  # integer-micro similarity top-k + tiebreaks
    "sample_weighted_priority",  # hash-keyed priority order statistics
    "stats_equidepth_histogram",  # global ntile bucket edges
    "events_resample_interpolate",  # neighbor-pair linear fill
    "events_fifo_match",  # per-key FIFO pairing = sequence order
    "stats_mad_outliers",  # median-of-deviations order statistics
    "stats_quantile_interp_by_type",  # interpolated percentile grid
    "text_heaps_law_curve",  # cumulative-distinct growth curve
    "orders_skyline",  # dominance filter over a sorted sweep
    "agg_kmv_bottomk",  # bottom-k digest order
    "stats_kendall_by_year",  # concordant/discordant pair folds
    "mix_token_budget_apportion",  # largest-remainder rounding ranks
    "events_hysteresis_alerts",  # two-threshold state machine
    "forecast_backtest_daily",  # per-day rolling-origin folds
    # round-11 additions (matrix extended r11 — the r11-window and
    # r12-front order-sensitive subset not yet covered: IEEE struct
    # folds, cumulative-product survival steps, global rank identities,
    # sketch-state merges, sequential throttle state)
    "events_holt_linear",  # struct-accumulator IEEE fold over sorted seq
    "survival_km_purchase",  # ordered cumulative-product survival fold
    "orders_gini_spend",  # global rank identity over (cents, custkey)
    "graph_title_link_prediction",  # through-z pairs + top-10 tiebreaks
    "events_autocorr_daily",  # exact bigint lag-pair partials
    "spans_corruption_plan",  # gaps-and-islands window over masked pos
    "agg_bitmap_distinct",  # per-(day,bucket) bitmap partials OR-merge
    "agg_approx_topk_merge",  # per-week top-k state accumulate+combine
    "events_throttle_ttl",  # greedy kept-clock sequential state
    # round-12 additions (matrix extended r12 — the r13-front TPC-H
    # order-sensitive subset: rank/min windows with exact-tie keeps,
    # limit cuts under tiebreaks, cross-multiplied global thresholds,
    # semi/anti-gated limits; the rest of the 22 are pure decimal
    # aggregates already represented by q1)
    "tpch_q2_min_cost_supplier",  # per-part MIN window keeps exact ties
    "tpch_q3_shipping_priority",  # top-10 limit under (revenue, orderkey)
    "tpch_q11_important_stock",  # global window total + strict threshold
    "tpch_q15_top_supplier",  # rank over exact decimal, ties kept
    "tpch_q17_small_quantity_revenue",  # per-part cross-multiplied cut
    "tpch_q21_suppliers_who_kept_waiting",  # per-order set windows + ordered limit
    # round-13 additions: every entry rewritten onto the two-pass global
    # rank (operators/ordered_stats) or the TakeOrdered top-k cut must
    # stay bit-identical under any shuffle width (the helper adds a
    # bucket exchange + broadcast offsets — exactly the machinery that
    # could drift if it ever keyed on something non-deterministic)
    "orders_pareto_share",  # two-pass global rank + top-20% share
    "rfm_segments",  # three chained two-pass ntile(4) ranks
    "orders_abc_classification",  # two-pass running sum + 1-row total
    "docs_length_deciles",  # two-pass rank + integer ntile(10)
    "sample_weighted_systematic",  # two-pass prefix sum + PPS point counts
    "vocab_build",  # two-pass (freq, token) rank -> contiguous ids
    "docs_encode_ids",  # vocab ids consumed through a broadcast join
    "classifier_auc_exact",  # two-pass exclusive prefix over score grain
    "classifier_calibration_bins",  # two-pass rank + integer ntile(10)
    "orders_winsorize_p1_p99",  # two-pass rank -> p1/p99 order statistics
    "compaction_plan_bins",  # two-pass running sum -> next-fit bins
    "session_top_paths",  # TakeOrdered top-k + re-derived rank
    "supplier_reliability_scorecard",  # two-pass risk rank, micro ties
    "events_topk_movers",  # TakeOrdered top-k + re-derived rank
]


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_shuffle_width(spark, sf_dir, name):
    import __spark_entry__ as e

    q = e.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for width in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            df = q(spark, sf_dir)
            cols = sorted(df.columns)
            results[width] = sorted(
                (tuple(row[c] for c in cols) for row in df.select(*cols).collect()),
                # None-safe total order (nullable columns, e.g. the
                # k-center seed's d2 or RRF's single-list ranks)
                key=lambda t: tuple((v is None, v) for v in t),
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["3"] == results["32"] and len(results["3"]) > 0
