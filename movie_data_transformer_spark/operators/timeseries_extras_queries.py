"""Round-6 time-series extension: CUSUM drift detection over the event
stream's daily volume — the standard page-drift / data-quality alarm a
training-data ingest pipeline runs on every source feed.

The textbook CUSUM fold s_i = max(0, s_{i-1} + dev_i) looks inherently
sequential, but it has a closed WINDOW form:

    s_i = prefix_i - least(0, min_{j<=i} prefix_j)

(prefix = running sum of deviations; proof: the running min is exactly
the amount the max(0, .) clamp has discarded). That turns an
unparallelizable recurrence into two ordinary ordered windows — the
difference between a driver loop and a plan that scales.

Exactness: deviations are scaled by n_days (dev_i = n_i * n_days -
total), so no division ever happens; everything is bigint and the entry
carries a FULL DuckDB oracle. The drift flag compares the scaled CUSUM
against `total` (== one day-mean of accumulated excess in these units).

Scale: one data-sized shuffle to day grain; the windows (including the
over-() totals) run on the tiny day-grain table — same small-aggregate
pattern as the TPC-H q11/q15 thresholds. Day keys are integer epoch-days
(Spark unix_timestamp truncation == DuckDB floor(epoch()), NOTES.md
pitfall list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """CUSUM over a (day_idx, n_events) daily table via the window
    identity in the module docstring. Exposed separately so tests can
    drive planted drift series through the PRODUCTION expressions."""
    return daily.selectExpr(
        "day_idx",
        "n_events",
        "n_events * (count(*) OVER ()) - (sum(n_events) OVER ()) AS dev",
        "sum(n_events) OVER () AS total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "sum(dev) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS prefix",
        "total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "prefix",
        "min(prefix) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS runmin",
        "total",
    ).selectExpr(
        "day_idx",
        "n_events",
        "CAST(prefix - least(CAST(0 AS BIGINT), runmin) AS BIGINT)"
        " AS cusum_scaled",
        "CAST(IF(prefix - least(CAST(0 AS BIGINT), runmin) > total, 1, 0)"
        " AS INT) AS is_drift",
    )


def q_events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr("unix_timestamp(ts) DIV 86400 AS day_idx")
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    return cusum_from_daily(daily)


SQL_EVENTS_CUSUM_DRIFT = """
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
),
t AS (
    SELECT day_idx, n_events,
           n_events * CAST(count(*) OVER () AS BIGINT)
               - CAST(sum(n_events) OVER () AS BIGINT) AS dev,
           CAST(sum(n_events) OVER () AS BIGINT) AS total
    FROM daily
),
w1 AS (
    SELECT day_idx, n_events, total,
           CAST(sum(dev) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix
    FROM t
),
w AS (
    SELECT day_idx, n_events, total, prefix,
           CAST(min(prefix) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS runmin
    FROM w1
)
SELECT day_idx, n_events,
       CAST(prefix - least(CAST(0 AS BIGINT), runmin) AS BIGINT)
           AS cusum_scaled,
       CAST(CASE WHEN prefix - least(CAST(0 AS BIGINT), runmin) > total
                 THEN 1 ELSE 0 END AS INT) AS is_drift
FROM w
"""


PERIOD = 7  # weekly seasonality over the daily series
ALPHA, BETA, GAMMA = "0.3", "0.1", "0.2"


def _hw_exprs(el, x):
    """Generate the Holt-Winters additive update for one dialect from a
    single template, so both engines evaluate the IDENTICAL expression
    tree in the identical left-fold order (the holt_linear/EWMA/KM
    bit-exactness technique). Accumulator = 9-double array
    [level, trend, season_now, season_+1, ..., season_+6]; the seasonal
    queue ROTATES (drop head, append updated head) instead of an indexed
    write, which neither engine can spell identically. el(i) renders
    accumulator element i; x renders the new observation."""
    lp = f"({x} - {el(3)}) * {ALPHA} + ({el(1)} + {el(2)}) * (1.0 - {ALPHA})"
    bp = f"(({lp}) - {el(1)}) * {BETA} + {el(2)} * (1.0 - {BETA})"
    sp = f"({x} - ({lp})) * {GAMMA} + {el(3)} * (1.0 - {GAMMA})"
    rot = ", ".join(el(i) for i in range(4, 3 + PERIOD))
    return f"{lp}, {bp}, {rot}, {sp}"


def q_events_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple smoothing over the global daily
    event-count series (weekly seasonality): the last classical smoother
    after EWMA (single) and Holt (double), with the seasonal state as a
    rotating 7-queue inside the fold accumulator. Both engines fold the
    generated-identical expression tree left-to-right, so the doubles
    match bit-for-bit and the entry carries a FULL oracle.

    Scale: one shuffle to day grain; the fold runs over the tiny daily
    array (per-key forecasting at 100 TB folds per key after the same
    pre-aggregation, exactly like events_holt_linear's per-user form)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr("unix_timestamp(ts) DIV 86400 AS day_idx")
        .groupBy("day_idx")
        .agg(F.count("*").alias("n"))
    )
    merge = _hw_exprs(lambda i: f"element_at(acc, {i})", "x")
    init = ", ".join(
        ["CAST(element_at(vals, 1) AS DOUBLE)", "CAST(0.0 AS DOUBLE)"]
        + ["CAST(0.0 AS DOUBLE)"] * PERIOD
    )
    return (
        daily.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("day_idx"), F.col("n")))
            ).alias("seq")
        )
        .selectExpr("transform(seq, s -> CAST(s.n AS DOUBLE)) AS vals")
        .selectExpr(
            "CAST(size(vals) AS BIGINT) AS n_days",
            f"aggregate(slice(vals, 2, size(vals) - 1), array({init}),"
            f" (acc, x) -> array({merge})) AS st",
        )
        .selectExpr(
            "n_days",
            "round(element_at(st, 1), 6) AS level",
            "round(element_at(st, 2), 6) AS trend",
            "round(element_at(st, 3), 6) AS season_next",
            "round(element_at(st, 1) + element_at(st, 2)"
            " + element_at(st, 3), 6) AS forecast_1",
        )
    )


def _hw_sql() -> str:
    merge = _hw_exprs(lambda i: f"a[{i}]", "e[1]")
    zeros = ", ".join(["0.0"] * PERIOD)
    pad = ", ".join(["0.0"] * (1 + PERIOD))
    return f"""
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           count(*) AS n
    FROM events GROUP BY 1
),
seq AS (SELECT list(CAST(n AS DOUBLE) ORDER BY day_idx) AS vals FROM daily),
folded AS (
    SELECT len(vals) AS n_days,
           list_reduce(
               list_prepend([CAST(vals[1] AS DOUBLE), 0.0, {zeros}],
                            list_transform(vals[2:], x -> [x, {pad}])),
               (a, e) -> [{merge}]) AS st
    FROM seq
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[3], 6) AS season_next,
       round(st[1] + st[2] + st[3], 6) AS forecast_1
FROM folded
"""


def q_stream_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor as a REAL stream: events stream through an
    availableNow foreachBatch run (map-only day projection appended per
    micro-batch), and the CUSUM windows run in finalize over the
    accumulated log — the production shape where a continuously
    ingesting feed gets its drift profile recomputed per trigger over
    day-grain state. Slicing-invariant by construction (day counts are
    associative over any micro-batching), so it shares the batch form's
    FULL oracle. At 100 TB the emissions log is the day-grain state
    table; per-trigger cost is one map pass + the tiny day-grain
    windows."""
    from movie_data_transformer_spark.sources.tables import load_events_stream
    from movie_data_transformer_spark.streaming.harness import (
        run_availablenow_to_df,
    )

    stream = load_events_stream(spark, sf_dir, maxFilesPerTrigger="1")
    days = stream.selectExpr("unix_timestamp(ts) DIV 86400 AS day_idx")
    return run_availablenow_to_df(
        days,
        "append",
        "mdt_cusum_",
        finalize=lambda em: cusum_from_daily(
            em.groupBy("day_idx").agg(F.count("*").cast("bigint").alias("n_events"))
        ),
    )


def q_events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event-count series
    (the moving-average STL ancestor): trend = centered 7-day moving
    average (NULL at the edges, full windows only), seasonal = the
    per-weekday mean of the detrended series, remainder = what's left.
    Everything in exact floor/trunc micro integers — the signed
    detrended means rely on the probed trunc-toward-zero DIV convention
    — so the entry carries a FULL oracle. One shuffle to day grain; the
    windows run on the tiny daily table (per-key decomposition at scale
    partitions the same windows by key)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr("unix_timestamp(ts) DIV 86400 AS day_idx")
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    return (
        daily.selectExpr(
            "day_idx",
            "n_events",
            "CASE WHEN count(*) OVER (ORDER BY day_idx ROWS BETWEEN 3"
            " PRECEDING AND 3 FOLLOWING) = 7 THEN"
            " (sum(n_events) OVER (ORDER BY day_idx ROWS BETWEEN 3"
            " PRECEDING AND 3 FOLLOWING)) * 1000000 DIV 7 END AS trend_micro",
        )
        .selectExpr(
            "day_idx",
            "n_events",
            "trend_micro",
            "n_events * 1000000 - trend_micro AS detrended_micro",
            "day_idx % 7 AS weekday",
        )
        .selectExpr(
            "day_idx",
            "n_events",
            "trend_micro",
            "CASE WHEN trend_micro IS NOT NULL THEN"
            " sum(detrended_micro) OVER (PARTITION BY weekday)"
            " DIV count(detrended_micro) OVER (PARTITION BY weekday)"
            " END AS seasonal_micro",
            "detrended_micro",
        )
        .selectExpr(
            "day_idx",
            "n_events",
            "CAST(trend_micro AS BIGINT) AS trend_micro",
            "CAST(seasonal_micro AS BIGINT) AS seasonal_micro",
            "CAST(detrended_micro - seasonal_micro AS BIGINT) AS remainder_micro",
        )
    )


SQL_EVENTS_SEASONAL_DECOMPOSE = """
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
),
tr AS (
    SELECT day_idx, n_events,
           CASE WHEN count(*) OVER (ORDER BY day_idx ROWS BETWEEN 3
                PRECEDING AND 3 FOLLOWING) = 7 THEN
                CAST(sum(n_events) OVER (ORDER BY day_idx ROWS BETWEEN 3
                PRECEDING AND 3 FOLLOWING) AS BIGINT) * 1000000 // 7
           END AS trend_micro
    FROM daily
),
dt AS (
    SELECT day_idx, n_events, trend_micro,
           n_events * 1000000 - trend_micro AS detrended_micro,
           day_idx % 7 AS weekday
    FROM tr
),
se AS (
    SELECT day_idx, n_events, trend_micro, detrended_micro,
           CASE WHEN trend_micro IS NOT NULL THEN
                CAST(sum(detrended_micro) OVER (PARTITION BY weekday)
                     AS BIGINT)
                // count(detrended_micro) OVER (PARTITION BY weekday)
           END AS seasonal_micro
    FROM dt
)
SELECT day_idx, n_events,
       CAST(trend_micro AS BIGINT) AS trend_micro,
       CAST(seasonal_micro AS BIGINT) AS seasonal_micro,
       CAST(detrended_micro - seasonal_micro AS BIGINT) AS remainder_micro
FROM se
"""


ACF_MAX_LAG = 7


def q_events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT autocorrelation function of the daily event-count series at
    lags 1..7 — the seasonality detector (a weekly cycle shows as a
    spike at lag 7) complementing events_seasonal_decompose, which
    ASSUMES period 7; this measures it.

    Exactness: with S = sum(x), N = n_days, the scaled deviation
    ndev_i = N*x_i - S is an exact bigint and

        acf_k = sum_i ndev_i * ndev_{i+k} / sum_i ndev_i^2

    (the N^2 factors cancel), so the only non-integer step is the final
    micro floor, done decimal-side with the remainder-subtract trick
    (m - m % d) / d — exact, and % takes the dividend's sign on BOTH
    engines, so negative autocorrelations truncate identically (the
    BM25 / classifier_kappa precedent). Domain: |ndev| < ~1e16 keeps
    every product inside DECIMAL(38,0) — at 1e16 daily events rescale
    the partials. Lagged pairs join on day_idx + k, so calendar gaps
    simply produce no pair (declared semantics).

    Scale: one corpus-sized shuffle to day grain; everything after runs
    on the tiny daily table (the 7-row lag spine cross-joins against
    it, and the 1-row denominator re-scans only day-grain data)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_acf_events")
    return spark.sql(
        f"""
        WITH daily AS (
            SELECT unix_timestamp(ts) DIV 86400 AS day_idx,
                   CAST(count(*) AS BIGINT) AS x
            FROM _acf_events GROUP BY 1
        ),
        dev AS (
            SELECT day_idx,
                   count(*) OVER () * x - sum(x) OVER () AS ndev
            FROM daily
        ),
        den AS (
            SELECT CAST(sum(CAST(ndev AS DECIMAL(19,0))
                * CAST(ndev AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS d
            FROM dev
        ),
        lags AS (SELECT explode(sequence(1, {ACF_MAX_LAG})) AS k),
        num AS (
            SELECT l.k,
                   CAST(sum(CAST(a.ndev AS DECIMAL(19,0))
                       * CAST(b.ndev AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS p,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM lags l
            JOIN dev a ON true
            JOIN dev b ON b.day_idx = a.day_idx + l.k
            GROUP BY l.k
        )
        SELECT k AS lag, n_pairs,
               CAST((m - (m % d)) / d AS BIGINT) AS acf_micro,
               CAST(CAST((m - (m % d)) / d AS BIGINT) AS DOUBLE) / 1000000
                   AS acf
        FROM (SELECT k, n_pairs, p * 1000000 AS m, d
              FROM num CROSS JOIN den)
        """
    )


SQL_EVENTS_DAILY_ACF = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
dev AS (
    SELECT day_idx,
           CAST(count(*) OVER () * x - sum(x) OVER () AS HUGEINT) AS ndev
    FROM daily
),
den AS (SELECT sum(ndev * ndev) AS d FROM dev),
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS k),
num AS (
    SELECT l.k,
           sum(a.ndev * b.ndev) AS p,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM lags l
    JOIN dev a ON true
    JOIN dev b ON b.day_idx = a.day_idx + l.k
    GROUP BY l.k
)
SELECT CAST(k AS INT) AS lag, n_pairs,
       CAST((m - (m % d)) // d AS BIGINT) AS acf_micro,
       CAST(CAST((m - (m % d)) // d AS BIGINT) AS DOUBLE) / 1000000 AS acf
FROM (SELECT k, n_pairs, p * 1000000 AS m, d
      FROM num CROSS JOIN den)
"""


ROLL_DAYS = 30
ROLL_MIN_N = 10


def q_events_rolling_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day OLS trend of daily event value: for every day, the
    exact least-squares slope of (day, daily micro-value) over the
    trailing 30-day RANGE window — the moving-regression smoother ops
    dashboards draw, and the windowed sibling of grouped_ols_trend.

    Exactness: the closed form slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2)
    needs only windowed SUMS, all exact bigints (x re-based to the
    corpus min day via a window-over-() so magnitudes stay small; y in
    floor-micro value units). The numerator times 1e6 can clear int64,
    so the micro floor runs decimal-side with the remainder-subtract
    trick (trunc-toward-zero on both engines, the BM25 precedent).
    RANGE (not ROWS) makes calendar gaps shrink n, not smear the frame.
    Days with window fill < ROLL_MIN_N are excluded (declared).

    Scale: one corpus-sized shuffle to day grain; the ordered windows
    run on the tiny daily table. The window frame is the plan — no
    self-join, no per-day re-aggregation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_rt_events")
    return spark.sql(
        f"""
        WITH daily AS (
            SELECT unix_timestamp(ts) DIV 86400 AS day_idx,
                   CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                       AS BIGINT)) AS BIGINT) AS y
            FROM _rt_events GROUP BY 1
        ),
        based AS (
            SELECT day_idx, day_idx - min(day_idx) OVER () AS x, y FROM daily
        ),
        sums AS (
            SELECT day_idx, x, y,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   CAST(sum(x) OVER w AS BIGINT) AS sx,
                   CAST(sum(y) OVER w AS BIGINT) AS sy,
                   CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
                   CAST(sum(x * y) OVER w AS BIGINT) AS sxy
            FROM based
            WINDOW w AS (ORDER BY x RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT day_idx, n AS n_days,
               CAST((m - (m % d)) / d AS BIGINT) AS slope_micro,
               CAST(CAST((m - (m % d)) / d AS BIGINT) AS DOUBLE) / 1000000
                   AS slope_micro_value_per_day
        FROM (
            SELECT day_idx, n,
                   CAST(n * sxy - sx * sy AS DECIMAL(38,0)) * 1000000 AS m,
                   CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS d
            FROM sums
        )
        WHERE n >= {ROLL_MIN_N}
        """
    )


SQL_EVENTS_ROLLING_TREND = f"""
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
               AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
),
based AS (
    SELECT day_idx, day_idx - min(day_idx) OVER () AS x, y FROM daily
),
sums AS (
    SELECT day_idx, x, y,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(x) OVER w AS BIGINT) AS sx,
           CAST(sum(y) OVER w AS BIGINT) AS sy,
           CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
           CAST(sum(x * y) OVER w AS BIGINT) AS sxy
    FROM based
    WINDOW w AS (ORDER BY x RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT day_idx, n AS n_days,
       CAST((m - (m % d)) // d AS BIGINT) AS slope_micro,
       CAST(CAST((m - (m % d)) // d AS BIGINT) AS DOUBLE) / 1000000
           AS slope_micro_value_per_day
FROM (
    SELECT day_idx, n,
           CAST(n * sxy - sx * sy AS HUGEINT) * 1000000 AS m,
           CAST(n * sxx - sx * sx AS HUGEINT) AS d
    FROM sums
)
WHERE n >= {ROLL_MIN_N}
"""


QUERIES = {
    "events_cusum_drift": (q_events_cusum_drift, SQL_EVENTS_CUSUM_DRIFT),
    "events_daily_acf": (q_events_daily_acf, SQL_EVENTS_DAILY_ACF),
    "events_rolling_trend": (q_events_rolling_trend, SQL_EVENTS_ROLLING_TREND),
    "events_holt_winters_daily": (q_events_holt_winters_daily, _hw_sql()),
    "stream_cusum_drift": (q_stream_cusum_drift, SQL_EVENTS_CUSUM_DRIFT),
    "events_seasonal_decompose": (
        q_events_seasonal_decompose,
        SQL_EVENTS_SEASONAL_DECOMPOSE,
    ),
}


def q_events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly screen: flag complete days whose
    decomposition REMAINDER sits more than 2 population-sd from the mean
    remainder — the alarm that fires on a genuinely odd Tuesday instead
    of on every weekend (which raw z-scores over the daily series do).

    Exactness: no sqrt ever happens — with d_i = n*r_i - S the condition
    |r_i - mean| > 2*sd cross-multiplies to d_i^2 > 4*(n*sum(r^2) - S^2),
    all exact integers (DECIMAL(38,0)/HUGEINT for the squares, the ACF
    precedent). Composes the production decomposition verbatim."""
    dec = q_events_seasonal_decompose(spark, sf_dir)
    dec.createOrReplaceTempView("_so_dec")
    return spark.sql(
        """
        WITH r AS (
            SELECT day_idx, n_events, remainder_micro
            FROM _so_dec WHERE remainder_micro IS NOT NULL
        ),
        s AS (
            SELECT day_idx, n_events, remainder_micro,
                   CAST(count(*) OVER () AS DECIMAL(38,0)) AS n,
                   CAST(sum(remainder_micro) OVER () AS DECIMAL(38,0)) AS sr,
                   CAST(sum(CAST(remainder_micro AS DECIMAL(19,0))
                       * CAST(remainder_micro AS DECIMAL(19,0))) OVER ()
                       AS DECIMAL(38,0)) AS srr
            FROM r
        )
        SELECT day_idx, n_events, remainder_micro,
               CAST(CASE WHEN (n * remainder_micro - sr)
                              * (n * remainder_micro - sr)
                              > 4 * (n * srr - sr * sr)
                         THEN 1 ELSE 0 END AS INT) AS is_outlier
        FROM s
        """
    )


SQL_EVENTS_SEASONAL_OUTLIERS = f"""
WITH r AS (
    SELECT day_idx, n_events, remainder_micro
    FROM ({SQL_EVENTS_SEASONAL_DECOMPOSE}) dec
    WHERE remainder_micro IS NOT NULL
),
s AS (
    SELECT day_idx, n_events, remainder_micro,
           CAST(count(*) OVER () AS HUGEINT) AS n,
           CAST(sum(remainder_micro) OVER () AS HUGEINT) AS sr,
           CAST(sum(CAST(remainder_micro AS HUGEINT)
               * CAST(remainder_micro AS HUGEINT)) OVER () AS HUGEINT) AS srr
    FROM r
)
SELECT day_idx, n_events, remainder_micro,
       CAST(CASE WHEN (n * remainder_micro - sr)
                      * (n * remainder_micro - sr)
                      > 4 * (n * srr - sr * sr)
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM s
"""


QUERIES["events_seasonal_outliers"] = (
    q_events_seasonal_outliers,
    SQL_EVENTS_SEASONAL_OUTLIERS,
)


TREND_TOP_K = 3
TREND_SLIDE_S = 1800
TREND_WIDTH_S = 3600


def q_stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-now over a REAL stream: top-3 event types per sliding
    1h/30min window. Each event fans out map-side to its two
    slide-aligned windows (explode of the two bucket starts — the
    stateless window assignment), micro-batches append to the emissions
    log, and finalize ranks per window — the standard split between the
    streaming aggregation (associative counts, slicing-invariant) and
    the rank, which streaming aggregates cannot express (no window
    functions over streaming aggs). Shares the batch form's FULL oracle.
    At 100 TB the per-trigger work is one map pass; counts pre-aggregate
    per (window, type) before the rank touches anything."""
    from movie_data_transformer_spark.sources.tables import load_events_stream
    from movie_data_transformer_spark.streaming.harness import (
        run_availablenow_to_df,
    )

    stream = load_events_stream(spark, sf_dir, maxFilesPerTrigger="1")
    proj = stream.selectExpr(
        f"explode(array(unix_timestamp(ts) DIV {TREND_SLIDE_S} * {TREND_SLIDE_S},"
        f" unix_timestamp(ts) DIV {TREND_SLIDE_S} * {TREND_SLIDE_S}"
        f" - {TREND_SLIDE_S})) AS bucket_start",
        "event_type",
    )

    def finalize(em: DataFrame) -> DataFrame:
        counts = em.groupBy("bucket_start", "event_type").agg(
            F.count("*").cast("bigint").alias("n_events")
        )
        return (
            counts.selectExpr(
                "CAST(bucket_start AS BIGINT) AS bucket_start",
                "event_type",
                "n_events",
                "CAST(row_number() OVER (PARTITION BY bucket_start"
                " ORDER BY n_events DESC, event_type ASC) AS INT) AS rk",
            )
            .filter(F.col("rk") <= TREND_TOP_K)
        )

    return run_availablenow_to_df(proj, "append", "mdt_trend_", finalize=finalize)


SQL_STREAM_TRENDING_TOPK = f"""
WITH assigned AS (
    SELECT CAST(floor(epoch(ts) / {TREND_SLIDE_S}) * {TREND_SLIDE_S} AS BIGINT)
               AS bucket_start, event_type
    FROM events
    UNION ALL
    SELECT CAST(floor(epoch(ts) / {TREND_SLIDE_S}) * {TREND_SLIDE_S}
               - {TREND_SLIDE_S} AS BIGINT), event_type
    FROM events
),
counts AS (
    SELECT bucket_start, event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM assigned GROUP BY 1, 2
)
SELECT bucket_start, event_type, n_events, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (PARTITION BY bucket_start
        ORDER BY n_events DESC, event_type ASC) AS rk
    FROM counts
)
WHERE rk <= {TREND_TOP_K}
"""


QUERIES["stream_trending_topk"] = (
    q_stream_trending_topk,
    SQL_STREAM_TRENDING_TOPK,
)


def q_events_changepoint_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point detection over the daily event-count series
    (one-split binary segmentation — the batch complement of the CUSUM
    monitor): the split day maximizing the between-segment variance
    reduction. For a split after position i (prefix sums S1/n1, suffix
    S2/n2), the reduction is (S1*n2 - S2*n1)^2 / (n1*n2*n) — EXACT
    rationals, ranked by their trunc-micro value with a day tie-break
    (remainder-subtract floor in DECIMAL/HUGEINT since the squared
    numerator times 1e6 clears int64), so the argmax is deterministic
    cross-engine. Output: the best split day, both segment means
    (micro), and the score.

    Scale: one shuffle to day grain; prefix sums + the argmax are
    windows over the tiny daily table."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_cp_events")
    return spark.sql(
        """
        WITH daily AS (
            SELECT unix_timestamp(ts) DIV 86400 AS day_idx,
                   CAST(count(*) AS BIGINT) AS x
            FROM _cp_events GROUP BY 1
        ),
        pre AS (
            SELECT day_idx, x,
                   sum(x) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS s1,
                   CAST(row_number() OVER (ORDER BY day_idx) AS BIGINT) AS n1,
                   sum(x) OVER () AS st,
                   count(*) OVER () AS nt
            FROM daily
        ),
        scored AS (
            SELECT day_idx,
                   n1, nt - n1 AS n2, s1, st - s1 AS s2,
                   CAST((s1 * (nt - n1) - (st - s1) * n1) AS DECIMAL(19,0))
                       * CAST((s1 * (nt - n1) - (st - s1) * n1) AS DECIMAL(19,0))
                       * 1000000 AS m,
                   CAST(n1 * (nt - n1) * nt AS DECIMAL(38,0)) AS d
            FROM pre
            WHERE n1 < nt
        )
        SELECT day_idx AS split_after_day,
               CAST(s1 * 1000000 DIV n1 AS BIGINT) AS mean_before_micro,
               CAST(s2 * 1000000 DIV n2 AS BIGINT) AS mean_after_micro,
               CAST(score_micro AS BIGINT) AS score_micro
        FROM (
            SELECT *, CAST((m - (m % d)) / d AS DECIMAL(38,0)) AS score_micro,
                   row_number() OVER (ORDER BY
                       CAST((m - (m % d)) / d AS DECIMAL(38,0)) DESC,
                       day_idx ASC) AS rk
            FROM scored
        )
        WHERE rk = 1
        """
    )


SQL_EVENTS_CHANGEPOINT_DAY = """
WITH daily AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
pre AS (
    SELECT day_idx, x,
           CAST(sum(x) OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
           CAST(row_number() OVER (ORDER BY day_idx) AS BIGINT) AS n1,
           CAST(sum(x) OVER () AS BIGINT) AS st,
           CAST(count(*) OVER () AS BIGINT) AS nt
    FROM daily
),
scored AS (
    SELECT day_idx,
           n1, nt - n1 AS n2, s1, st - s1 AS s2,
           CAST((s1 * (nt - n1) - (st - s1) * n1) AS HUGEINT)
               * CAST((s1 * (nt - n1) - (st - s1) * n1) AS HUGEINT)
               * 1000000 AS m,
           CAST(n1 * (nt - n1) * nt AS HUGEINT) AS d
    FROM pre
    WHERE n1 < nt
)
SELECT day_idx AS split_after_day,
       CAST(s1 * 1000000 // n1 AS BIGINT) AS mean_before_micro,
       CAST(s2 * 1000000 // n2 AS BIGINT) AS mean_after_micro,
       CAST(score_micro AS BIGINT) AS score_micro
FROM (
    SELECT *, (m - (m % d)) // d AS score_micro,
           row_number() OVER (ORDER BY (m - (m % d)) // d DESC,
               day_idx ASC) AS rk
    FROM scored
)
WHERE rk = 1
"""


QUERIES["events_changepoint_day"] = (
    q_events_changepoint_day,
    SQL_EVENTS_CHANGEPOINT_DAY,
)
