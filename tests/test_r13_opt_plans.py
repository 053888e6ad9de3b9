"""Plan pins + equivalence pins for the r13 OPTIMIZATION round: the
single-partition global-window removals (operators/ordered_stats).

Pin classes:
  1. ordered_stats is bit-identical to the builtin un-partitioned
     window (row_number / running sum / exclusive running max / ntile),
     across bucket counts — including the n < k ntile edge.
  2. Rewritten rank/prefix entries carry NO un-partitioned Window over
     data-grain rows: every global Window node in the physical plan must
     be one of the helper's bounded bucket-frame windows (references the
     `_gob` internals) or an explicitly allowed bounded-grain order key.
  3. Top-k entries (rank-then-filter rewrites) cut with
     TakeOrderedAndProject (parallel partial top-k), not a global
     row_number over every candidate row.
  4. tpch q11/q15: the scalar threshold is a 1-row broadcast off the
     persisted aggregate — no Window at all, InMemoryRelation present.
"""

from __future__ import annotations

import re

import pytest

#: entries rewritten onto attach_order_stats; value = extra order keys
#: (beyond the helper's _gob internals) allowed to appear in a global
#: Window because their frame is bounded by construction (e.g. the
#: 10-row decile table in heaps' growth curve).
RANK_ENTRIES: dict[str, tuple[str, ...]] = {
    "orders_pareto_share": (),
    "orders_gini_spend": (),
    "rfm_segments": (),
    "customers_rfm_scores": (),
    "orders_abc_classification": (),
    "docs_length_deciles": (),
    "sample_weighted_systematic": (),
    "stats_ks_two_sample": (),
    "score_quantile_normalize": (),
    "ccnet_lm_buckets": (),
    "vocab_build": (),
    "docs_encode_ids": (),
    "classifier_auc_exact": (),
    "classifier_calibration_bins": (),
    "orders_winsorize_p1_p99": (),
    "stats_equidepth_histogram": (),
    "compaction_plan_bins": (),
    "session_concurrency_steps": (),
    "supplier_reliability_scorecard": (),
    "orders_skyline": (),
    "text_heaps_law_curve": ("decile",),
}

TOPK_ENTRIES = [
    "session_top_paths",
    "sample_weighted_priority",
    "graph_title_link_prediction",
    "events_topk_movers",
]

SCALAR_ENTRIES = ["tpch_q11_important_stock", "tpch_q15_top_supplier"]

_WINDOW_LINE = re.compile(r"(?:^|\s)Window \[(.*)$")


def _plan_of(spark, sf_dir, name):
    import __spark_entry__ as e

    return (
        e.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _bad_global_windows(plan: str, allowed: tuple[str, ...]) -> list[str]:
    """Window toString shapes: `[exprs]` (global, unordered),
    `[exprs], [order]` (global, ordered — order entries carry ASC/DESC),
    `[exprs], [partition]` (partitioned, unordered),
    `[exprs], [partition], [order]` (partitioned, ordered). Only the
    global shapes funnel data to one partition."""
    bad = []
    for line in plan.splitlines():
        m = _WINDOW_LINE.search(line)
        if not m:
            continue
        body = m.group(1).rstrip()
        if body.endswith("]"):
            body = body[:-1]
        groups = body.split("], [")
        partitioned = len(groups) >= 3 or (
            len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[-1])
        )
        if partitioned:
            continue
        if "_gob" in line:
            continue  # the helper's bounded bucket-row frames
        if any(key in line for key in allowed):
            continue  # explicitly allowed bounded-grain frame
        bad.append(line.strip()[:200])
    return bad


_THR_CONF = "spark.movieDataTransformer.globalOrderTwoPassBytes"


@pytest.mark.parametrize("name", sorted(RANK_ENTRIES))
def test_no_data_grain_global_window_at_scale(spark, sf_dir, name):
    """With the size-adaptive threshold forced to 0 (every input counts
    as LARGE — the 100 TB condition), no rewritten entry may plan an
    un-partitioned Window over data-grain rows."""
    spark.conf.set(_THR_CONF, "0")
    try:
        plan = _plan_of(spark, sf_dir, name)
    finally:
        spark.conf.unset(_THR_CONF)
    bad = _bad_global_windows(plan, RANK_ENTRIES[name])
    assert not bad, f"{name}: un-partitioned data-grain Window(s): {bad}"


@pytest.mark.parametrize("name", TOPK_ENTRIES)
def test_topk_entries_cut_with_take_ordered(spark, sf_dir, name):
    plan = _plan_of(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, name


@pytest.mark.parametrize("name", SCALAR_ENTRIES)
def test_scalar_thresholds_ride_broadcast_not_window(spark, sf_dir, name):
    plan = _plan_of(spark, sf_dir, name)
    assert not _WINDOW_LINE.search(plan), f"{name}: Window survived"
    assert "InMemoryRelation" in plan, f"{name}: aggregate not persisted"


def test_adaptive_small_input_keeps_single_job_plan(spark, sf_dir):
    """At test scale (MB inputs, far under the 128 MB threshold) the
    helper must choose the plain window — the genuinely optimal plan
    when the whole rank input fits one task — so the bench keeps the
    r12 plan shape for these entries."""
    plan = _plan_of(spark, sf_dir, "orders_pareto_share")
    assert "_gob" not in plan


def test_ordered_stats_matches_builtin_windows(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.ordered_stats import (
        attach_order_stats,
        ntile_expr,
    )

    rows = [(i, (i * 37) % 50 - 10, (i * 13) % 7) for i in range(1, 601)]
    df = spark.createDataFrame(rows, "id long, key long, val long")
    w = Window.orderBy(F.col("key").asc(), F.col("id").asc())
    ref = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("rs"),
        F.max("val").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("rm"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.ntile(4).over(w).alias("t4"),
        F.ntile(7).over(w).alias("t7"),
    )
    exp = {
        r["id"]: (r["rn"], r["rs"], r["rm"], r["n"], r["t4"], r["t7"])
        for r in ref.collect()
    }
    for buckets in (1, 4, 16):
        got_df = attach_order_stats(
            df,
            [F.col("key").asc(), F.col("id").asc()],
            "key",
            False,
            row_number="rn",
            running={"rs": "val"},
            running_max_excl={"rm": "val"},
            total_count="n",
            n_buckets=buckets,
        ).selectExpr(
            "id",
            "rn",
            "rs",
            "rm",
            "n",
            ntile_expr("rn", "n", 4) + " AS t4",
            ntile_expr("rn", "n", 7) + " AS t7",
        )
        got = {
            r["id"]: (r["rn"], r["rs"], r["rm"], r["n"], r["t4"], r["t7"])
            for r in got_df.collect()
        }
        assert got == exp, f"buckets={buckets}"


def test_ordered_stats_descending_and_small_n(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.ordered_stats import (
        attach_order_stats,
        ntile_expr,
    )

    rows = [(i, (i * 7) % 5) for i in range(1, 4)]  # n=3 < k=4 ntile edge
    df = spark.createDataFrame(rows, "id long, key long")
    w = Window.orderBy(F.col("key").desc(), F.col("id").asc())
    exp = {
        r["id"]: (r["rn"], r["t"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("t"),
        ).collect()
    }
    got_df = attach_order_stats(
        df,
        [F.col("key").desc(), F.col("id").asc()],
        "key",
        True,
        row_number="rn",
        total_count="n",
        n_buckets=3,
    ).selectExpr("id", "rn", ntile_expr("rn", "n", 4) + " AS t")
    got = {r["id"]: (r["rn"], r["t"]) for r in got_df.collect()}
    assert got == exp


def test_rank_entries_invariant_to_form_and_bucket_count(spark, sf_dir):
    """Neither the size-adaptive form switch nor the bucket count may
    change results: plain window (default at test scale) == two-pass at
    B=1 == two-pass at B=7, on real entries."""
    import __spark_entry__ as e

    qs = e.queries()
    bconf = "spark.movieDataTransformer.globalOrderBuckets"
    for name in ("orders_pareto_share", "docs_length_deciles"):
        results = {}
        try:
            for label, thr, b in (
                ("plain", None, None),
                ("b1", "0", "1"),
                ("b7", "0", "7"),
            ):
                if thr is None:
                    spark.conf.unset(_THR_CONF)
                    spark.conf.unset(bconf)
                else:
                    spark.conf.set(_THR_CONF, thr)
                    spark.conf.set(bconf, b)
                df = qs[name](spark, sf_dir)
                cols = sorted(df.columns)
                results[label] = sorted(
                    tuple(row[c] for c in cols)
                    for row in df.select(*cols).collect()
                )
        finally:
            spark.conf.unset(_THR_CONF)
            spark.conf.unset(bconf)
        assert results["plain"] == results["b1"] == results["b7"], name
        assert results["plain"], name
