"""Pipeline metrics & counters — reference op 16 (SURVEY.md §2.1).

Reference: AtomicInteger successCount/failureCount/updateCount incremented
per customer during the sink loop (DataTransformationService.java:170-172,
:189,:194,:197) and logged at :202-203. Spark-native replacement:
`df.observe(...)` — metrics are computed inside the job (no second pass,
no driver-side loop) and read back after the action completes.

merge_flat_with_metrics mirrors the reference's counter taxonomy exactly:
  n_inserted : customers/movies seen for the first time   (:194 newCount)
  n_updated  : batch row strictly newer -> replaced state (:189 updateCount)
  n_kept     : state retained (tie / older / unparseable) (the :196-199
               "swallowed" path, minus the exceptions)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.merge import merge_flat


@dataclass
class MergeMetrics:
    n_out: int
    n_inserted: int
    n_updated: int
    n_kept: int


def merge_flat_with_metrics(
    state: DataFrame, batch: DataFrame
) -> tuple[DataFrame, Observation]:
    """merge_flat + an Observation carrying the op-16 counters. The caller
    runs an action on the returned DataFrame, then reads
    `observation.get` -> {"n_out", "n_inserted", "n_updated", "n_kept"}."""
    merged = merge_flat(state, batch, with_decision=True)
    obs = Observation("merge_metrics")
    observed = merged.observe(
        obs,
        F.count(F.lit(1)).alias("n_out"),
        F.sum(F.col("_decision").eqNullSafe("insert").cast("long")).alias("n_inserted"),
        F.sum(F.col("_decision").eqNullSafe("update").cast("long")).alias("n_updated"),
        F.sum(F.col("_decision").eqNullSafe("keep").cast("long")).alias("n_kept"),
    ).drop("_decision")
    return observed, obs


def read_merge_metrics(obs: Observation) -> MergeMetrics:
    got = obs.get
    return MergeMetrics(
        n_out=got["n_out"],
        n_inserted=got["n_inserted"],
        n_updated=got["n_updated"],
        n_kept=got["n_kept"],
    )
