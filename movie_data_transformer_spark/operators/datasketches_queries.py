"""Apache DataSketches surfaces new in Spark 4: Theta sketches (the
set-operation family — union/intersection/difference — that HLL's
scalar cardinalities cannot express) and KLL quantile sketches.

Completes the engine's sketch matrix: HLL (mergeable count-distinct,
agg_hll_mergeable), Count-Min (frequency, agg_cms_heavy_hitters),
fixed-grid quantiles (agg_quantile_sketch), and now sketched SET
ALGEBRA + the production KLL quantile functions.

Oracle strategy: a Theta sketch retains every distinct hash until it
exceeds its nominal capacity (lgK=12 -> 4096), so below that it is an
EXACT sample of the set and union/intersection/difference are exact
set arithmetic — at the validation SFs (<= 1500 users/month) the
estimates equal the true counts and the entry carries a FULL oracle.
Beyond capacity the same plan degrades gracefully to ~2% error; the
oracle binds the mechanics, SCALE.md documents the regime change. KLL
compacts immediately (k=200), so that entry is rows-only with an
oracle-checked rank-error gate (the sketch_accuracy_gate pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

THETA_SQL = """
WITH partials AS (
    SELECT weekofyear(ts) AS wk, day(ts) AS d,
           theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END) AS sv,
           theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END) AS sp
    FROM _th_events GROUP BY 1, 2
),
merged AS (
    SELECT wk, theta_union_agg(sv) AS sv, theta_union_agg(sp) AS sp,
           count(*) AS n_partials
    FROM partials GROUP BY wk
)
SELECT CAST(wk AS BIGINT) AS wk,
       CAST(theta_sketch_estimate(sv) AS BIGINT) AS n_viewers,
       CAST(theta_sketch_estimate(sp) AS BIGINT) AS n_purchasers,
       CAST(theta_sketch_estimate(theta_intersection(sv, sp)) AS BIGINT) AS n_both,
       CAST(theta_sketch_estimate(theta_difference(sv, sp)) AS BIGINT) AS n_view_only,
       CAST(n_partials AS BIGINT) AS n_partials
FROM merged
"""


def q_agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched AUDIENCE SET ALGEBRA per ISO week: viewers, purchasers,
    viewer∩purchaser, viewer∖purchaser — from per-(week, day) Theta
    partials merged with theta_union_agg, the store-sketches-then-ask
    workflow for set overlap questions at 100 TB (exact distinct
    intersection would shuffle the full key set per question; the
    sketches are persisted once and every overlap query is sketch-sized).
    A day with no purchases contributes an EMPTY sketch (estimate 0),
    not a NULL — pinned by the all-NULL-group probe in tests."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_th_events")
    return spark.sql(THETA_SQL)


SQL_AGG_THETA_SETOPS = """
WITH flags AS (
    SELECT week(ts) AS wk, user_id,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
    FROM events GROUP BY 1, 2
),
days AS (
    SELECT week(ts) AS wk, count(DISTINCT day(ts)) AS n_partials
    FROM events GROUP BY 1
)
SELECT CAST(f.wk AS BIGINT) AS wk,
       CAST(sum(f.v) AS BIGINT) AS n_viewers,
       CAST(sum(f.p) AS BIGINT) AS n_purchasers,
       CAST(sum(f.v * f.p) AS BIGINT) AS n_both,
       CAST(sum(f.v * (1 - f.p)) AS BIGINT) AS n_view_only,
       CAST(max(d.n_partials) AS BIGINT) AS n_partials
FROM flags f JOIN days d ON f.wk = d.wk
GROUP BY f.wk
"""


KLL_SQL = """
WITH partials AS (
    SELECT event_type, day(ts) AS d,
           kll_sketch_agg_double(value) AS sk
    FROM _kll_events GROUP BY 1, 2
),
merged AS (
    SELECT event_type, kll_merge_agg_double(sk) AS sk
    FROM partials GROUP BY event_type
)
SELECT event_type,
       kll_sketch_get_quantile_double(sk, 0.5d) AS p50,
       kll_sketch_get_quantile_double(sk, 0.9d) AS p90,
       kll_sketch_get_quantile_double(sk, 0.99d) AS p99
FROM merged
"""


def q_agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches per event_type from per-day partials merged
    with the N-way kll_merge_agg_double aggregate — the real
    persist-partials-then-merge workflow (one sketch per partition/day
    in the lake, any subset merged on demand). KLL compacts from the
    first batch (k=200), so estimates are approximate -> rows-only;
    kll_rank_gate is the binding oracle evidence."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_kll_events")
    return spark.sql(KLL_SQL)


def q_kll_rank_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binding gate for agg_kll_quantiles: for every event_type and each
    target rank p in {0.5, 0.9, 0.99}, the exact rank bracket of the
    KLL estimate — [frac(< est), frac(<= est)] — must overlap
    [p - 0.03, p + 0.03] (KLL k=200 has ~1.6% rank error at 99%
    confidence; 3% is the collapse gate, not a precision claim)."""
    est = q_agg_kll_quantiles(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    j = ev.join(F.broadcast(est), "event_type")
    fracs = j.groupBy("event_type").agg(
        *[
            f
            for col in ("p50", "p90", "p99")
            for f in (
                F.avg((F.col("value") < F.col(col)).cast("double")).alias(f"lo_{col}"),
                F.avg((F.col("value") <= F.col(col)).cast("double")).alias(f"hi_{col}"),
            )
        ]
    )
    return fracs.agg(
        *[
            (
                ~F.max(
                    (F.col(f"hi_{c}") < p - 0.03) | (F.col(f"lo_{c}") > p + 0.03)
                )
            ).alias(f"{c}_rank_within_3pct")
            for p, c in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    )


SQL_KLL_RANK_GATE = (
    "SELECT CAST(1 AS BOOLEAN) AS p50_rank_within_3pct, "
    "CAST(1 AS BOOLEAN) AS p90_rank_within_3pct, "
    "CAST(1 AS BOOLEAN) AS p99_rank_within_3pct"
)


BITMAP_SQL = """
WITH partials AS (
    SELECT weekofyear(ts) AS wk, day(ts) AS d,
           bitmap_bucket_number(user_id) AS bkt,
           bitmap_construct_agg(bitmap_bit_position(
               CASE WHEN event_type = 'view' THEN user_id END)) AS bv,
           bitmap_construct_agg(bitmap_bit_position(
               CASE WHEN event_type = 'purchase' THEN user_id END)) AS bp,
           bitmap_construct_agg(bitmap_bit_position(
               CASE WHEN event_type IN ('view', 'purchase') THEN user_id END)) AS bu
    FROM _bm_events GROUP BY 1, 2, 3
),
merged AS (
    SELECT wk, bkt,
           bitmap_count(bitmap_or_agg(bv)) AS nv,
           bitmap_count(bitmap_or_agg(bp)) AS np,
           bitmap_count(bitmap_or_agg(bu)) AS nu
    FROM partials GROUP BY wk, bkt
)
SELECT CAST(wk AS BIGINT) AS wk,
       CAST(sum(nv) AS BIGINT) AS n_viewers,
       CAST(sum(np) AS BIGINT) AS n_purchasers,
       CAST(sum(nv) + sum(np) - sum(nu) AS BIGINT) AS n_both,
       CAST(sum(nu) - sum(np) AS BIGINT) AS n_view_only
FROM merged GROUP BY wk
"""


def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT sibling of agg_theta_setops: weekly audience overlap
    from Spark's integer-bitmap aggregates. Per-(week, day, 32k-bucket)
    bitmaps (bitmap_construct_agg of bit positions) merge by bitwise OR
    (bitmap_or_agg — associative, mergeable, EXACT at any scale), and
    the intersection falls out of inclusion-exclusion (|V|+|P|-|V∪P|),
    so no AND pass is needed. This is the store-exact-partials workflow
    for dense integer key spaces at 100 TB: a bitmap segment covers 32k
    ids in 4 KB regardless of row count, and re-asking any distinct
    question is a bitmap OR + popcount, never a key-set shuffle. Theta
    (above) is the sparse/huge-key-space fallback."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_bm_events")
    return spark.sql(BITMAP_SQL)


SQL_AGG_BITMAP_DISTINCT = """
WITH flags AS (
    SELECT week(ts) AS wk, user_id,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
    FROM events GROUP BY 1, 2
)
SELECT CAST(wk AS BIGINT) AS wk,
       CAST(sum(v) AS BIGINT) AS n_viewers,
       CAST(sum(p) AS BIGINT) AS n_purchasers,
       CAST(sum(v * p) AS BIGINT) AS n_both,
       CAST(sum(v * (1 - p)) AS BIGINT) AS n_view_only
FROM flags GROUP BY wk
"""


TOPK_SQL = """
WITH states AS (
    SELECT weekofyear(ts) AS wk,
           approx_top_k_accumulate(event_type, 10) AS st
    FROM _tk_events GROUP BY 1
),
comb AS (SELECT approx_top_k_combine(st) AS st FROM states)
SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS n_events
FROM comb LATERAL VIEW inline(approx_top_k_estimate(st, 10)) t AS item, count
"""


def q_agg_approx_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's mergeable top-k family as the store-partials workflow:
    per-week approx_top_k_accumulate states, approx_top_k_combine to the
    global state, approx_top_k_estimate to rows. With k (10) >= the
    distinct event-type count the structure never evicts, so the counts
    are EXACT and the entry carries a full oracle — the same
    exact-below-capacity strategy as agg_theta_setops; beyond capacity
    the identical plan degrades to approximate heavy hitters (the
    regime agg_cms_heavy_hitters models with explicit md5 rows)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_tk_events")
    return spark.sql(TOPK_SQL)


SQL_AGG_APPROX_TOPK_MERGE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


QUERIES = {
    "agg_theta_setops": (q_agg_theta_setops, SQL_AGG_THETA_SETOPS),
    "agg_kll_quantiles": (q_agg_kll_quantiles, None),  # approximate -> rows-only
    "kll_rank_gate": (q_kll_rank_gate, SQL_KLL_RANK_GATE),
    "agg_bitmap_distinct": (q_agg_bitmap_distinct, SQL_AGG_BITMAP_DISTINCT),
    "agg_approx_topk_merge": (q_agg_approx_topk_merge, SQL_AGG_APPROX_TOPK_MERGE),
}
