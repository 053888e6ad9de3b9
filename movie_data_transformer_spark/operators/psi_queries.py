"""Population Stability Index — THE production drift monitor for scored
pipelines (credit/quality scoring lore; also Gopher-style corpus QA):
compare the distribution of `value` between a reference window (first
half of the event timeline, Jan 1-15) and the current window (Jan 16+),
over fixed bin edges, and report the per-bin PSI contributions.

    PSI = sum_bins (p_i - q_i) * ln(p_i / q_i)

with add-one smoothing so empty bins stay finite. Bin edges are FIXED
LITERALS (0,5,10,20,40,80,160,320,inf — a log-ish grid for a long-tail
value), so binning is pure double comparison — engine-identical. Counts
are exact bigints; each bin's term evaluates doubles derived from the
same integers and floors to micro units per bin BEFORE the sum, so the
total is an order-independent integer sum (the dsir_queries libm note).

Entry `score_psi_bins` (FULL DuckDB oracle): per bin — bin label,
ref_n, cur_n, and psi_term_micro; the headline PSI is the column sum
(conventional alert threshold 0.2 => 200000 micro), pinned in pytest.

Scale: one events scan, map-side CASE binning, an 8-row aggregate —
scan-bound at 100 TB; the only join is the 1-row totals broadcast
(no data-sized join, no windows — plan-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

EDGES = (5, 10, 20, 40, 80, 160, 320)
SPLIT = "2024-01-16 00:00:00"


def _bin_expr() -> str:
    parts = [f"WHEN value < {EDGES[0]} THEN 'b0_lt{EDGES[0]}'"]
    for i in range(1, len(EDGES)):
        parts.append(
            f"WHEN value < {EDGES[i]} THEN 'b{i}_lt{EDGES[i]}'"
        )
    parts.append(f"ELSE 'b{len(EDGES)}_gte{EDGES[-1]}'")
    return "CASE " + " ".join(parts) + " END"


_N_BINS = len(EDGES) + 1


def q_score_psi_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.selectExpr(
        f"{_bin_expr()} AS bin",
        f"CAST(ts < TIMESTAMP '{SPLIT}' AS INT) AS is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("ref_n"),
        F.sum(F.expr("1 - is_ref")).cast("bigint").alias("cur_n"),
    )
    totals = counts.agg(
        F.sum("ref_n").cast("bigint").alias("ref_tot"),
        F.sum("cur_n").cast("bigint").alias("cur_tot"),
    )
    return counts.crossJoin(F.broadcast(totals)).selectExpr(
        "bin",
        "ref_n",
        "cur_n",
        f"CAST(floor(("
        f" CAST(ref_n + 1 AS DOUBLE) / (ref_tot + {_N_BINS})"
        f" - CAST(cur_n + 1 AS DOUBLE) / (cur_tot + {_N_BINS})"
        f") * ln("
        f" (CAST(ref_n + 1 AS DOUBLE) * (cur_tot + {_N_BINS})) /"
        f" (CAST(cur_n + 1 AS DOUBLE) * (ref_tot + {_N_BINS}))"
        f") * 1000000) AS BIGINT) AS psi_term_micro",
    )


SQL_SCORE_PSI_BINS = f"""
WITH binned AS (
    SELECT {_bin_expr()} AS bin,
           CAST(ts < TIMESTAMP '{SPLIT}' AS INT) AS is_ref
    FROM events
),
counts AS (
    SELECT bin,
           CAST(sum(is_ref) AS BIGINT) AS ref_n,
           CAST(sum(1 - is_ref) AS BIGINT) AS cur_n
    FROM binned GROUP BY bin
),
totals AS (
    SELECT CAST(sum(ref_n) AS BIGINT) AS ref_tot,
           CAST(sum(cur_n) AS BIGINT) AS cur_tot
    FROM counts
)
SELECT bin, ref_n, cur_n,
       CAST(floor((
            CAST(ref_n + 1 AS DOUBLE) / (ref_tot + {_N_BINS})
            - CAST(cur_n + 1 AS DOUBLE) / (cur_tot + {_N_BINS})
       ) * ln(
            (CAST(ref_n + 1 AS DOUBLE) * (cur_tot + {_N_BINS})) /
            (CAST(cur_n + 1 AS DOUBLE) * (ref_tot + {_N_BINS}))
       ) * 1000000) AS BIGINT) AS psi_term_micro
FROM counts, totals
"""


QUERIES = {
    "score_psi_bins": (q_score_psi_bins, SQL_SCORE_PSI_BINS),
}
