"""Robust statistics for data cleaning: MAD outlier screening and
percentile winsorization — the two standard defenses against heavy
tails before any mean-based metric or model feature is computed (sd-
based screens like events_seasonal_outliers break down exactly when
outliers are present; the median/MAD pair does not).

Both entries are EXACT integer order statistics with FULL oracles:
medians are the crossing row of a row_number over the (value, id) total
order (the stats_weighted_median_by_year convention), never a float
quantile estimate.

- `stats_mad_outliers`: per event_type, median, MAD (median absolute
  deviation), and the count of |x - med| > 3 * MAD points. Two ranked
  passes over the same per-type partitioning.
- `orders_winsorize_p1_p99`: clip order totals at the exact p1/p99
  order statistics (rank ceil(q*n) over (cents, orderkey)); reports
  pre/post sums and clip counts in one row — the audit a feature
  pipeline logs when winsorizing.

Scale: both are per-group window sorts on natural keys (event_type /
the global orders series); at 100 TB the documented swap is the KLL
sketch (agg_kll_quantiles) for the cut points with the same downstream
clip/compare pass — identical output grain, sketch error instead of a
total sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.ordered_stats import attach_order_stats
from movie_data_transformer_spark.sources.tables import load_table


def q_stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "event_id", "CAST(floor(value * 100) AS BIGINT) AS cents"
    )
    med = (
        ev.selectExpr(
            "event_type",
            "cents",
            "row_number() OVER (PARTITION BY event_type"
            " ORDER BY cents, event_id) AS rn",
            "count(*) OVER (PARTITION BY event_type) AS n",
        )
        .filter("rn = (n + 1) div 2")
        .selectExpr("event_type", "cents AS med_cents")
    )
    dev = ev.join(med, "event_type").selectExpr(
        "event_type", "event_id", "cents", "med_cents",
        "abs(cents - med_cents) AS dev"
    )
    mad = (
        dev.selectExpr(
            "event_type",
            "dev",
            "row_number() OVER (PARTITION BY event_type"
            " ORDER BY dev, event_id) AS rn",
            "count(*) OVER (PARTITION BY event_type) AS n",
        )
        .filter("rn = (n + 1) div 2")
        .selectExpr("event_type", "dev AS mad_cents")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum(F.expr("CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_outliers"),
        )
    )


SQL_STATS_MAD_OUTLIERS = """
WITH ev AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
    FROM events
),
med AS (
    SELECT event_type, cents AS med_cents
    FROM (SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM ev)
    WHERE rn = (n + 1) // 2
),
dev AS (
    SELECT ev.event_type, ev.event_id, ev.cents, med.med_cents,
           abs(ev.cents - med.med_cents) AS dev
    FROM ev JOIN med USING (event_type)
),
mad AS (
    SELECT event_type, dev AS mad_cents
    FROM (SELECT event_type, dev,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY dev, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM dev)
    WHERE rn = (n + 1) // 2
)
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(dev.med_cents) AS BIGINT) AS med_cents,
       CAST(min(mad.mad_cents) AS BIGINT) AS mad_cents,
       CAST(sum(CASE WHEN dev.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


def q_orders_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents"
    )
    # two-pass global rank (ordered_stats) — the old un-partitioned
    # row_number/count windows were Exchange SinglePartition over the
    # full order grain; scan-rooted 2-column input, so no cache needed
    ranked = attach_order_stats(
        orders,
        [F.col("cents").asc(), F.col("o_orderkey").asc()],
        "cents",
        False,
        row_number="rn",
        total_count="n",
        persist_input=False,
    ).select("cents", "rn", "n")
    cuts = ranked.selectExpr(
        "max(CASE WHEN rn = (n * 1 + 99) div 100 THEN cents END) AS lo_cents",
        "max(CASE WHEN rn = (n * 99 + 99) div 100 THEN cents END) AS hi_cents",
    )
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .selectExpr(
            "n",
            "lo_cents",
            "hi_cents",
            "cents",
            "least(greatest(cents, lo_cents), hi_cents) AS wcents",
        )
        .selectExpr(
            "CAST(max(n) AS BIGINT) AS n",
            "max(lo_cents) AS lo_cents",
            "max(hi_cents) AS hi_cents",
            "CAST(sum(cents) AS BIGINT) AS sum_cents_raw",
            "CAST(sum(wcents) AS BIGINT) AS sum_cents_winsorized",
            "CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_clipped_low",
            "CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_clipped_high",
        )
    )


SQL_ORDERS_WINSORIZE = """
WITH ranked AS (
    SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
           row_number() OVER (ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT),
                              o_orderkey) AS rn,
           count(*) OVER () AS n
    FROM orders
),
cuts AS (
    SELECT max(CASE WHEN rn = (n * 1 + 99) // 100 THEN cents END) AS lo_cents,
           max(CASE WHEN rn = (n * 99 + 99) // 100 THEN cents END) AS hi_cents
    FROM ranked
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(max(lo_cents) AS BIGINT) AS lo_cents,
       CAST(max(hi_cents) AS BIGINT) AS hi_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents_raw,
       CAST(sum(least(greatest(cents, lo_cents), hi_cents)) AS BIGINT)
           AS sum_cents_winsorized,
       CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_low,
       CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_high
FROM ranked, cuts
"""


def q_stats_quantile_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-7 (numpy/R default) INTERPOLATED quantiles per event_type, in
    exact micro-cents: h = (n-1)*q lands between order statistics x_lo
    and x_hi, result = x_lo + frac*(x_hi - x_lo). With q in tenths the
    fraction is k/10, so the interpolation is exact integer arithmetic —
    the estimator every float implementation approximates, here bit-
    exact and oracle-checked. Complements the crossing-row medians
    (discontinuous type-1) and the KLL sketch (approximate)."""
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "event_id", "CAST(floor(value * 100) AS BIGINT) AS cents"
    )
    ranked = ev.selectExpr(
        "event_type",
        "cents",
        "row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id)"
        " AS rn",
        "count(*) OVER (PARTITION BY event_type) AS n",
    )
    out = ranked.groupBy("event_type").agg(F.max("n").alias("n"))
    for q, name in ((5, "p50"), (9, "p90")):
        picks = (
            ranked.groupBy("event_type")
            .agg(
                F.expr(
                    f"max(CASE WHEN rn = (n - 1) * {q} div 10 + 1"
                    " THEN cents END)"
                ).alias("lo"),
                F.expr(
                    f"max(CASE WHEN rn = least((n - 1) * {q} div 10 + 2, n)"
                    " THEN cents END)"
                ).alias("hi"),
                F.expr(f"max((n - 1) * {q} % 10)").alias("frac10"),
            )
            .selectExpr(
                "event_type",
                "CAST(lo * 1000000 + (hi - lo) * frac10 * 100000 AS BIGINT)"
                f" AS {name}_cents_micro",
            )
        )
        out = out.join(picks, "event_type")
    return out.selectExpr(
        "event_type", "CAST(n AS BIGINT) AS n",
        "p50_cents_micro", "p90_cents_micro"
    )


def _sql_quantile_interp() -> str:
    def pick(q: int, name: str) -> str:
        return f"""
{name} AS (
    SELECT event_type,
           CAST(max(lo) * 1000000 + (max(hi) - max(lo)) * max(frac10) * 100000
                AS BIGINT) AS {name}_cents_micro
    FROM (
        SELECT event_type,
               max(CASE WHEN rn = (n - 1) * {q} // 10 + 1 THEN cents END) AS lo,
               max(CASE WHEN rn = least((n - 1) * {q} // 10 + 2, n)
                   THEN cents END) AS hi,
               max((n - 1) * {q} % 10) AS frac10
        FROM ranked GROUP BY event_type
    ) GROUP BY event_type
)"""

    return f"""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
    FROM events
),
ranked AS (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM ev
),{pick(5, "p50")},{pick(9, "p90")}
SELECT r.event_type, CAST(max(r.n) AS BIGINT) AS n,
       max(p50.p50_cents_micro) AS p50_cents_micro,
       max(p90.p90_cents_micro) AS p90_cents_micro
FROM ranked r
JOIN p50 ON p50.event_type = r.event_type
JOIN p90 ON p90.event_type = r.event_type
GROUP BY r.event_type
"""


QUERIES = {
    "stats_mad_outliers": (q_stats_mad_outliers, SQL_STATS_MAD_OUTLIERS),
    "orders_winsorize_p1_p99": (q_orders_winsorize, SQL_ORDERS_WINSORIZE),
    "stats_quantile_interp_by_type": (q_stats_quantile_interp, _sql_quantile_interp()),
}
