"""Silence segmentation (VAD pre-processing) over decoded audio — the
step between windowed energy (mm_audio_window_energy, reused verbatim
as the front of this dataflow) and clip extraction in an audio corpus
pipeline: flag windows whose mean-square amplitude falls below a
threshold, collapse consecutive silent windows into segments
(gaps-and-islands — the spans_corruption_plan trick on the window
axis), and report the silence geometry per clip.

Silence rule (exact, cross-multiplied — no division): window is silent
iff energy < THRESH_SQ * n_samples, i.e. mean square below 8192^2
(~25% of full scale). The sawtooth fixture crosses zero slowly at small
steps, so BOTH silent and loud windows occur (pinned in pytest).

Entry `mm_audio_silence_segments` (FULL DuckDB oracle): per doc —
n_windows, n_silent, n_segments, longest_silence (windows in the
longest run), silence_rate_micro.

Scale: ONE energy pass (no-shuffle mapInPandas fan-out) feeds a
running-count island window per doc over window-grain rows (thousands
of times smaller than samples) and two stacked doc-keyed aggs on the
same partitioning — the decode subtree is never duplicated and no join
forms (loud windows fold into the NULL island, so clip totals ride the
same aggregate). Decode-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_transformer_spark.operators.mm_transform_queries import (
    AUDIO_WINDOW,
    q_mm_audio_window_energy,
)

THRESH_SQ = 8192 * 8192


def q_mm_audio_silence_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # SINGLE decode pass: the island id rides a running silent-count
    # window over ALL windows (island = window_idx - running_count for
    # silent rows, NULL for loud ones), so totals and segment stats fold
    # from the same stream — no second decode branch, no join.
    wins = q_mm_audio_window_energy(spark, sf_dir).selectExpr(
        "doc_id",
        "window_idx",
        f"CAST(energy < {THRESH_SQ} * n_samples AS INT) AS silent",
    )
    w = Window.partitionBy("doc_id").orderBy("window_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tagged = wins.select(
        "doc_id",
        "silent",
        (F.col("window_idx") - F.sum("silent").over(w)).alias("gap_key"),
    ).selectExpr(
        "doc_id",
        "silent",
        "IF(silent = 1, gap_key, NULL) AS island",
    )
    seg = tagged.groupBy("doc_id", "island").agg(
        F.count("*").cast("bigint").alias("run")
    )
    return (
        seg.groupBy("doc_id")
        .agg(
            F.sum("run").cast("bigint").alias("n_windows"),
            F.sum(F.expr("IF(island IS NOT NULL, run, 0L)"))
            .cast("bigint")
            .alias("n_silent"),
            F.sum(F.expr("IF(island IS NOT NULL, 1, 0)"))
            .cast("bigint")
            .alias("n_segments"),
            F.max(F.expr("IF(island IS NOT NULL, run, 0L)"))
            .cast("bigint")
            .alias("longest_silence"),
        )
        .selectExpr(
            "doc_id",
            "n_windows",
            "n_silent",
            "n_segments",
            "longest_silence",
            "CAST(n_silent * 1000000 DIV n_windows AS BIGINT)"
            " AS silence_rate_micro",
        )
    )


SQL_MM_AUDIO_SILENCE_SEGMENTS = f"""
WITH p AS (SELECT doc_id, 400 + doc_id % 400 AS n, 64 + doc_id % 1000 AS step
           FROM documents),
s AS (SELECT doc_id, n, step, unnest(range(0, n)) AS i FROM p),
v AS (SELECT doc_id, i // {AUDIO_WINDOW} AS window_idx,
             ((i * step) % 65536) - 32768 AS x
      FROM s),
wins AS (
    SELECT doc_id, window_idx,
           CAST(sum(x * x) < {THRESH_SQ} * count(*) AS INT) AS silent
    FROM v GROUP BY doc_id, window_idx
),
islands AS (
    SELECT doc_id, window_idx,
           window_idx - row_number() OVER (PARTITION BY doc_id
                                           ORDER BY window_idx) AS island
    FROM wins WHERE silent = 1
),
seg AS (
    SELECT doc_id, island, CAST(count(*) AS BIGINT) AS run
    FROM islands GROUP BY doc_id, island
),
per_doc AS (
    SELECT doc_id,
           CAST(sum(run) AS BIGINT) AS n_silent,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(max(run) AS BIGINT) AS longest_silence
    FROM seg GROUP BY doc_id
),
totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
    FROM wins GROUP BY doc_id
)
SELECT t.doc_id, t.n_windows,
       coalesce(p.n_silent, 0) AS n_silent,
       coalesce(p.n_segments, 0) AS n_segments,
       coalesce(p.longest_silence, 0) AS longest_silence,
       CAST(coalesce(p.n_silent, 0) * 1000000 // t.n_windows AS BIGINT)
           AS silence_rate_micro
FROM totals t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
"""


QUERIES = {
    "mm_audio_silence_segments": (
        q_mm_audio_silence_segments,
        SQL_MM_AUDIO_SILENCE_SEGMENTS,
    ),
}
