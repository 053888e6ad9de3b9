"""Time-series analytics: trailing time-range windows, quantile binning,
robust (median/MAD) outlier screening, and exponentially-weighted moving
averages.

These fill the remaining gaps in the "absent categories" of SURVEY.md
S2.3 (the reference has no window functions at all — its only windowed
idea is the dedup-latest arg-max, `DataTransformationService.java:206-238`)
and round out the event-stream analytics a training-data pipeline runs
over telemetry before sampling: time-bounded aggregates (RANGE frames,
not ROWS), decile binning for length-balanced sampling, robust outlier
gates that a heavy tail cannot poison (median/MAD, unlike the z-score in
analytics_queries which a single extreme value drags), and EWMA trend
smoothing.

Cross-engine exactness notes:
- RANGE frames are keyed on integer epoch-seconds; Spark `unix_timestamp`
  truncates fractional seconds while DuckDB `CAST(epoch(ts) AS BIGINT)`
  ROUNDS -> the oracle uses `floor(epoch(ts))` everywhere.
- Trailing sums are exact DECIMAL sums (order-independent).
- Spark `percentile(x, q)` and DuckDB `quantile_cont(x, q)` both use the
  same `q*(n-1)` linear interpolation on the sorted values and agree
  bit-for-bit (probed on the real data); deviations/z expressions are
  written with identical operation order on both sides and rounded
  before comparison/filtering.
- The EWMA fold is a deterministic left fold over an explicitly totally
  ordered list ((ts, event_id) -> no ties): Spark
  `aggregate(slice(vs, 2, n-1), vs[1], acc*0.8 + x*0.2)` == DuckDB
  `list_reduce(list(value ORDER BY ts, event_id), ...)` — the identical
  sequence of IEEE operations, hence bit-stable without any decimal cast.

Scale notes (100 TB): every op here is a single hash-partition shuffle on
its natural key (user_id / event_type) followed by in-partition sorting
that Spark spills; nothing collects to the driver. The MAD screen joins
two tiny per-type stats tables back to the fact scan via broadcast. The
decile binning runs on the two-pass global rank (operators/ordered_stats
— quantile-bucketed parallel prefix rank), so there is no
single-partition window at doc grain; the result is bit-identical to
ntile over the same total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.ordered_stats import (
    attach_order_stats,
    ntile_expr,
)
from movie_data_transformer_spark.sources.tables import load_table

SEVEN_DAYS_S = 7 * 86400


def q_window_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day spend: a RANGE frame over epoch seconds
    (time-bounded, unlike the ROWS frame of window_running_sum). Exact
    decimal sum; peers at the same second aggregate identically in both
    engines because RANGE frames are defined on the ordering value."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_sec"))
        .rangeBetween(-SEVEN_DAYS_S, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").alias("t_sec"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .withColumn("trailing_7d_sum", F.sum("v").over(w))
        .select(
            "event_id",
            "user_id",
            "t_sec",
            F.col("trailing_7d_sum").cast("double").alias("trailing_7d_sum"),
        )
    )


SQL_WINDOW_TRAILING_7D = f"""
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS t_sec,
       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN {SEVEN_DAYS_S} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d_sum
FROM events
"""


def q_docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents binned into length deciles (ntile over a TOTAL order —
    (n_chars, doc_id) — so tile assignment is deterministic), then
    per-decile corpus stats: the length-balanced-sampling prep step.
    The tile comes from the two-pass global rank (ordered_stats) + the
    integer ntile formula — no single-partition window at doc grain; the
    input is a narrow scan-rooted (doc_id, n_chars) frame, so the extra
    passes re-read two pruned parquet columns instead of caching."""
    docs = load_table(spark, sf_dir, "documents")
    ranked = attach_order_stats(
        docs.select("doc_id", "n_chars"),
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        "n_chars",
        False,
        row_number="_rn",
        total_count="_n",
        persist_input=False,
    )
    return (
        ranked.withColumn("decile", F.expr(ntile_expr("_rn", "_n", 10)))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SQL_DOCS_LENGTH_DECILES = """
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT doc_id, n_chars,
           ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
    FROM documents
)
GROUP BY 1
"""


def q_events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: modified z-score 0.6745*(x-median)/MAD per
    event_type, flagging |rz| > 3.5 (Iglewicz-Hoaglin). Median and MAD
    are exact interpolated percentiles — identical in both engines — and
    robust to the heavy tail that inflates the stddev of the plain
    z-score screen (analytics_queries.q_events_value_outliers)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    rz = F.round(
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"), 6
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) > 3.5)
        .select("event_id", "event_type", "value", "rz")
    )


SQL_EVENTS_VALUE_MAD_OUTLIERS = """
WITH m AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY 1
), d AS (
    SELECT e.event_id, e.event_type, e.value, m.med,
           abs(e.value - m.med) AS adev
    FROM events e JOIN m USING (event_type)
), md AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM d GROUP BY 1
)
SELECT d.event_id, d.event_type, d.value,
       round(0.6745 * (d.value - d.med) / md.mad, 6) AS rz
FROM d JOIN md USING (event_type)
WHERE abs(round(0.6745 * (d.value - d.med) / md.mad, 6)) > 3.5
"""


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.2) of event value in time order: collect
    the totally-ordered (ts, event_id, value) list per user and fold it
    left — seed = first value, acc*0.8 + x*0.2 per step. One shuffle on
    user_id; the fold runs inside the JVM via higher-order functions
    (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("seq"))
        .select(
            "user_id",
            F.size("seq").alias("n_events"),
            F.round(
                F.expr(
                    "aggregate(slice(transform(seq, s -> s.value), 2, size(seq) - 1), "
                    "element_at(transform(seq, s -> s.value), 1), "
                    "(acc, x) -> acc * 0.8d + x * 0.2d)"
                ),
                6,
            ).alias("ewma_value"),
        )
    )


SQL_EVENTS_EWMA = """
SELECT user_id,
       CAST(count(*) AS INTEGER) AS n_events,
       round(list_reduce(list(value ORDER BY ts ASC, event_id ASC),
                         (a, b) -> a * 0.8 + b * 0.2), 6) AS ewma_value
FROM events
GROUP BY 1
"""


def q_events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each event's value into its event_type's
    [P01, P99] band — the tail-taming transform applied before training
    on heavy-tailed telemetry (cheaper than dropping outliers, keeps
    row count). Exact interpolated percentiles (bit-equal across
    engines); the clamp is least/greatest — no arithmetic at all."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    pcts = ev.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"),
    )
    return (
        ev.join(F.broadcast(pcts), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
                "value_w"
            ),
        )
    )


SQL_EVENTS_VALUE_WINSORIZED = """
WITH p AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS p01,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, p.p01), p.p99) AS value_w
FROM events e JOIN p USING (event_type)
"""


def q_events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear (double exponential) smoothing — level +
    trend state folded over the time-ordered value sequence
    (alpha=0.2, beta=0.1; init l=x0, b=x1-x0), emitting the final state
    and the one-step-ahead forecast l+b. The EWMA entry's cross-engine
    IEEE-fold technique extended to a STRUCT accumulator: Spark's
    aggregate() carries named_struct('l','b'), DuckDB's list_reduce
    carries a 2-element list — both sides evaluate the IDENTICAL
    expression tree in the identical left-fold order, so the doubles
    match bit-for-bit (l' is spelled out twice inside b' on BOTH sides
    rather than let either engine reuse a subexpression differently).
    One shuffle on user_id; the fold is JVM-side (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    holt = (
        "CASE WHEN size(vals) = 1 THEN named_struct("
        "'l', CAST(element_at(vals, 1) AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)) "
        "ELSE aggregate(slice(vals, 3, size(vals) - 2), "
        "named_struct('l', CAST(element_at(vals, 1) AS DOUBLE), "
        "'b', CAST(element_at(vals, 2) - element_at(vals, 1) AS DOUBLE)), "
        "(acc, x) -> named_struct("
        "'l', x * 0.2d + (acc.l + acc.b) * 0.8d, "
        "'b', (x * 0.2d + (acc.l + acc.b) * 0.8d - acc.l) * 0.1d + acc.b * 0.9d)) "
        "END"
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("seq"))
        .selectExpr("user_id", "transform(seq, s -> s.value) AS vals")
        .selectExpr("user_id", "size(vals) AS n_events", f"{holt} AS lb")
        .selectExpr(
            "user_id",
            "n_events",
            "round(lb.l, 6) AS level",
            "round(lb.b, 6) AS trend",
            "round(lb.l + lb.b, 6) AS forecast_1",
        )
    )


SQL_EVENTS_HOLT_LINEAR = """
WITH seq AS (
    SELECT user_id, list(value ORDER BY ts ASC, event_id ASC) AS vs
    FROM events GROUP BY 1
),
folded AS (
    SELECT user_id, len(vs) AS n_events,
           CASE WHEN len(vs) = 1 THEN [CAST(vs[1] AS DOUBLE), 0.0]
                ELSE list_reduce(
                    list_prepend([CAST(vs[1] AS DOUBLE),
                                  CAST(vs[2] - vs[1] AS DOUBLE)],
                                 list_transform(vs[3:], x -> [CAST(x AS DOUBLE), 0.0])),
                    (a, e) -> [e[1] * 0.2 + (a[1] + a[2]) * 0.8,
                               (e[1] * 0.2 + (a[1] + a[2]) * 0.8 - a[1]) * 0.1
                               + a[2] * 0.9])
           END AS lb
    FROM seq
)
SELECT user_id,
       CAST(n_events AS INTEGER) AS n_events,
       round(lb[1], 6) AS level,
       round(lb[2], 6) AS trend,
       round(lb[1] + lb[2], 6) AS forecast_1
FROM folded
"""


def q_survival_km_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase after
    signup, with right-censoring at the corpus horizon — survival
    analysis, the classic time-to-event operator. Durations are exact
    integer days (floor(epoch) seconds DIV 86400, the unix_timestamp-
    truncation pitfall convention); the at-risk counts are a reverse
    cumulative integer sum; and the survival estimate is the cumulative
    product of (1 - d/n) factors in ASCENDING event-time order, folded
    LEFT-TO-RIGHT on both engines (Spark: one array aggregate over the
    tiny per-curve step table, the events_ewma technique; DuckDB:
    per-index list_reduce over the same ordered factor list) — so the
    IEEE multiply order is identical and the doubles match bit-for-bit.

    Scale: everything up to the step table is per-user aggregation
    (one shuffle); the fold runs over |distinct event times| rows —
    curve-sized, never data-sized."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_km_events")
    return spark.sql(
        """
        WITH su AS (
            SELECT user_id,
                   min(CAST(floor(unix_timestamp(ts)) AS BIGINT)) AS su_s
            FROM _km_events WHERE event_type = 'signup' GROUP BY user_id
        ),
        fp AS (
            SELECT e.user_id, min(CAST(floor(unix_timestamp(e.ts)) AS BIGINT))
                       AS fp_s
            FROM _km_events e JOIN su ON e.user_id = su.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(unix_timestamp(e.ts)) AS BIGINT) > su.su_s
            GROUP BY e.user_id
        ),
        horizon AS (
            SELECT max(CAST(floor(unix_timestamp(ts)) AS BIGINT)) AS h_s
            FROM _km_events
        ),
        times AS (
            SELECT su.user_id,
                   CASE WHEN fp.fp_s IS NOT NULL
                        THEN (fp.fp_s - su.su_s) DIV 86400
                        ELSE (horizon.h_s - su.su_s) DIV 86400 END AS t,
                   CASE WHEN fp.fp_s IS NOT NULL THEN 1 ELSE 0 END AS is_event
            FROM su LEFT JOIN fp ON su.user_id = fp.user_id
            CROSS JOIN horizon
        ),
        grp AS (
            SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS m
            FROM times GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   sum(m) OVER (ORDER BY t DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS n
            FROM grp
        ),
        km AS (SELECT t, d, CAST(n AS BIGINT) AS n FROM risk WHERE d > 0),
        one AS (
            SELECT array_sort(collect_list(struct(t, d, n))) AS arr FROM km
        ),
        folded AS (
            SELECT arr,
                   slice(aggregate(arr, array(CAST(1.0 AS DOUBLE)),
                         (acc, x) -> array_append(acc,
                             element_at(acc, -1)
                             * (CAST(1.0 AS DOUBLE)
                                - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)))),
                       2, size(arr)) AS surv
            FROM one
        )
        SELECT z.s.t AS t, z.s.n AS n_at_risk, z.s.d AS d,
               z.sv AS survival
        FROM folded
        LATERAL VIEW inline(arrays_zip(arr, surv)) z AS s, sv
        """
    )


SQL_SURVIVAL_KM_PURCHASE = """
WITH su AS (
    SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS su_s
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
fp AS (
    SELECT e.user_id, CAST(min(floor(epoch(e.ts))) AS BIGINT) AS fp_s
    FROM events e JOIN su ON e.user_id = su.user_id
    WHERE e.event_type = 'purchase'
      AND CAST(floor(epoch(e.ts)) AS BIGINT) > su.su_s
    GROUP BY e.user_id
),
horizon AS (
    SELECT CAST(max(floor(epoch(ts))) AS BIGINT) AS h_s FROM events
),
times AS (
    SELECT su.user_id,
           CASE WHEN fp.fp_s IS NOT NULL
                THEN (fp.fp_s - su.su_s) // 86400
                ELSE (horizon.h_s - su.su_s) // 86400 END AS t,
           CASE WHEN fp.fp_s IS NOT NULL THEN 1 ELSE 0 END AS is_event
    FROM su LEFT JOIN fp ON su.user_id = fp.user_id
    CROSS JOIN horizon
),
grp AS (
    SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS m
    FROM times GROUP BY t
),
risk AS (
    SELECT t, d,
           CAST(sum(m) OVER (ORDER BY t DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n
    FROM grp
),
km AS (SELECT t, d, n FROM risk WHERE d > 0),
one AS (
    SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS arr FROM km
)
SELECT arr[i].t AS t,
       arr[i].n AS n_at_risk,
       arr[i].d AS d,
       list_reduce(
           list_prepend(CAST(1.0 AS DOUBLE),
               list_transform(arr[1:i],
                   x -> CAST(1.0 AS DOUBLE)
                        - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
           (a, b) -> a * b) AS survival
FROM one, unnest(generate_series(1, len(arr))) AS u(i)
"""


QUERIES = {
    "window_trailing_7d": (q_window_trailing_7d, SQL_WINDOW_TRAILING_7D),
    "events_holt_linear": (q_events_holt_linear, SQL_EVENTS_HOLT_LINEAR),
    "events_value_winsorized": (
        q_events_value_winsorized,
        SQL_EVENTS_VALUE_WINSORIZED,
    ),
    "docs_length_deciles": (q_docs_length_deciles, SQL_DOCS_LENGTH_DECILES),
    "events_value_mad_outliers": (
        q_events_value_mad_outliers,
        SQL_EVENTS_VALUE_MAD_OUTLIERS,
    ),
    "events_ewma": (q_events_ewma, SQL_EVENTS_EWMA),
    "survival_km_purchase": (q_survival_km_purchase, SQL_SURVIVAL_KM_PURCHASE),
}
