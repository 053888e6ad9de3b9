"""Behavioral analytics: user-journey transitions, RFM segmentation,
bitwise aggregates, corpus-mix diversity, inter-order cadence.

These extend the engine's analytic surface past the reference's single
dataflow (reference has NO general aggregation/window surface at all —
`DataTransformationService.java:146-167` is its only group-by). Each
query here is a pattern a production events/corpus pipeline runs daily,
expressed as pure Catalyst plans with cross-engine-exact arithmetic:

- counts and integer products stay BIGINT (exact on both engines),
- every ratio is ONE IEEE double division on exact integer inputs
  (correctly rounded, hence bit-identical in Spark and DuckDB),
- rank/tile windows always order by a TOTAL key (metric, id) so tile
  assignment is partitioning- and engine-independent.

Scale notes (100 TB): the transition matrix shuffles the events once by
user_id (the window), then aggregates pairs — output is
|event_type|^2 rows, so the share window runs on a tiny relation. RFM
aggregates orders down to |customers| rows BEFORE the global ntile; the
single-partition sort only ever sees the aggregate, never the facts
(same pattern as docs_length_deciles). Gini runs entirely on
(source, lang) counts — dozens of rows. The bitwise agg is a plain
partial/final hash agg. Order-gap stats shuffle orders once by
customer; the global percentile reduces per-partition multisets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.ordered_stats import (
    attach_order_stats,
    ntile_expr,
)
from movie_data_transformer_spark.sources.tables import load_table


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + probabilities over each
    user's event sequence. (user_id, ts) is unique in the testdata, so
    ordering by ts alone is total per user; event_id is added as a
    belt-and-braces tiebreak. share is EXACT integer micro-units
    ((n * 10^6) div total, then one IEEE division by 10^6): round() on
    the raw ratio is a cross-engine landmine — an exact integer ratio
    like odd/128 = x.xx78125 lands exactly on a 1e-6 midpoint, where
    Spark (exact-BigDecimal HALF_UP) and DuckDB (FP-scaled) round apart
    (the tpch_q2 bug class, NOTES.md pitfalls)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("_total", F.sum("n").over(wp))
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.expr("(n * 1000000) div _total").cast("double") / F.lit(1000000.0)).alias(
                "share"
            ),
        )
    )


SQL_EVENTS_TRANSITION_MATRIX = """
WITH seq AS (
    SELECT user_id,
           event_type AS next_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_type
    FROM events
),
pairs AS (
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
           / 1000000 AS share
FROM pairs
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation over orders: recency (days since the
    customer's last order, vs the corpus max date), frequency (order
    count), monetary (exact decimal revenue). Each dimension gets
    ntile(4) over a TOTAL order (metric, custkey) — 4 = best. The
    global ntile runs on the |customers|-row aggregate, never the
    order facts. Quintile sibling with concatenated segment labels:
    analytics_extras_queries.q_customers_rfm_scores (the recency
    definitions are bound together by
    test_rfm_siblings_agree_on_recency)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("monetary"),
    )
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("corpus_max"))
    # Each ntile(4) was an un-partitioned window = Exchange SinglePartition
    # over the customer grain (r12 verdict's scale-killer class). The
    # two-pass rank (ordered_stats) + the integer ntile formula reproduce
    # the builtin bit-for-bit; the three rank passes chain, each persisting
    # its (customer-grain) input as the fork point for its bucket passes.
    base = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.col("corpus_max"), F.col("last_order")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    s1 = attach_order_stats(
        base,
        [F.col("recency_days").desc(), F.col("o_custkey").asc()],
        "recency_days",
        True,
        row_number="_rn_r",
        total_count="_n",
    )
    s2 = attach_order_stats(
        s1,
        [F.col("frequency").asc(), F.col("o_custkey").asc()],
        "frequency",
        False,
        row_number="_rn_f",
    )
    s3 = attach_order_stats(
        s2,
        [F.col("monetary").asc(), F.col("o_custkey").asc()],
        "monetary",
        False,
        row_number="_rn_m",
    )
    return (
        s3.select(
            "o_custkey",
            "recency_days",
            "frequency",
            F.col("monetary").cast("double").alias("monetary"),
            F.expr(ntile_expr("_rn_r", "_n", 4)).alias("r_score"),
            F.expr(ntile_expr("_rn_f", "_n", 4)).alias("f_score"),
            F.expr(ntile_expr("_rn_m", "_n", 4)).alias("m_score"),
        )
        .withColumn(
            "segment",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
                "string"
            ),
        )
    )


SQL_RFM_SEGMENTS = """
WITH per_cust AS (
    SELECT o_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_order,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS monetary
    FROM orders GROUP BY 1
),
maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS corpus_max FROM orders),
rfm AS (
    SELECT o_custkey,
           date_diff('day', last_order, corpus_max) AS recency_days,
           frequency, monetary
    FROM per_cust CROSS JOIN maxd
)
SELECT o_custkey, recency_days, frequency,
       CAST(monetary AS DOUBLE) AS monetary,
       ntile(4) OVER (ORDER BY recency_days DESC, o_custkey ASC) AS r_score,
       ntile(4) OVER (ORDER BY frequency ASC, o_custkey ASC) AS f_score,
       ntile(4) OVER (ORDER BY monetary ASC, o_custkey ASC) AS m_score,
       CAST(ntile(4) OVER (ORDER BY recency_days DESC, o_custkey ASC) * 100
            + ntile(4) OVER (ORDER BY frequency ASC, o_custkey ASC) * 10
            + ntile(4) OVER (ORDER BY monetary ASC, o_custkey ASC) AS VARCHAR) AS segment
FROM rfm
"""


def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates of event ids per event type — the
    set-membership / parity-sketch primitives (XOR-fold is the classic
    'find the unpaired element' and lightweight checksum). Plain
    partial/final hash agg; both engines define these exactly on
    BIGINT."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.bit_and("event_id").alias("ids_and"),
        F.bit_or("event_id").alias("ids_or"),
        F.bit_xor("event_id").alias("ids_xor"),
    )


SQL_AGG_BITWISE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       bit_and(event_id) AS ids_and,
       bit_or(event_id) AS ids_or,
       bit_xor(event_id) AS ids_xor
FROM events
GROUP BY 1
"""


def q_source_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix diversity per document source as Gini impurity
    1 - sum(p_i^2). Computed as 1 - sum(cnt^2)/total^2 on exact BIGINT
    sums — one double division, no per-language float summation whose
    order could differ across engines (the reason this is Gini and not
    Shannon entropy: log() is not correctly rounded in either runtime)."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    # integer micro-units: 1 - sumsq/total^2 == (total^2 - sumsq)/total^2
    # is a pure integer ratio, so round(double, 6) is the cross-engine
    # midpoint landmine (NOTES.md pitfalls); floor in exact bigint math
    # instead. Bounded: total^2 * 1e6 needs total <= 3e6 docs per source.
    return (
        per_lang.groupBy("source")
        .agg(
            F.count("*").alias("n_langs"),
            F.sum("cnt").alias("n_docs"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("_sumsq"),
        )
        .selectExpr(
            "source",
            "n_langs",
            "n_docs",
            "CAST((n_docs * n_docs - _sumsq) * 1000000 div (n_docs * n_docs)"
            " AS DOUBLE) / 1000000 AS gini_impurity",
        )
    )


SQL_SOURCE_GINI_DIVERSITY = """
WITH per_lang AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
    FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_langs,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST((sum(cnt) * sum(cnt) - sum(cnt * cnt)) * 1000000
            // (sum(cnt) * sum(cnt)) AS DOUBLE) / 1000000 AS gini_impurity
FROM per_lang
GROUP BY 1
"""


def q_orders_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order cadence: per-customer gaps between consecutive
    orders (lag over a total (date, orderkey) order), then per-year
    percentiles of the gap distribution. Spark percentile() and DuckDB
    quantile_cont() share the q*(n-1) interpolation and are bit-exact
    on integer inputs (probed in events_value_mad_outliers)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date").asc(), F.col("o_orderkey").asc()
    )
    gaps = (
        o.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("od"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
        .select(F.year("od").alias("order_year"), "gap_days")
    )
    return gaps.groupBy("order_year").agg(
        F.count("*").alias("n_gaps"),
        # integer-ratio average -> floor micro-units (midpoint-proof)
        F.expr(
            "CAST(sum(gap_days) * 1000000 div count(*) AS DOUBLE) / 1000000"
        ).alias("avg_gap_days"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap_days, 0.9)"), 6).alias("p90_gap"),
    )


SQL_ORDERS_GAP_STATS = """
WITH gaps AS (
    SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
           date_diff('day',
                     lag(CAST(o_orderdate AS DATE))
                         OVER (PARTITION BY o_custkey
                               ORDER BY CAST(o_orderdate AS DATE) ASC,
                                        o_orderkey ASC),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
)
SELECT order_year,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_days) * 1000000 // count(*) AS DOUBLE) / 1000000 AS avg_gap_days,
       round(quantile_cont(gap_days, 0.5), 6) AS p50_gap,
       round(quantile_cont(gap_days, 0.9), 6) AS p90_gap
FROM gaps
WHERE gap_days IS NOT NULL
GROUP BY 1
"""


QUERIES = {
    "events_transition_matrix": (
        q_events_transition_matrix,
        SQL_EVENTS_TRANSITION_MATRIX,
    ),
    "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    "agg_bitwise": (q_agg_bitwise, SQL_AGG_BITWISE),
    "source_gini_diversity": (q_source_gini_diversity, SQL_SOURCE_GINI_DIVERSITY),
    "orders_gap_stats": (q_orders_gap_stats, SQL_ORDERS_GAP_STATS),
}
