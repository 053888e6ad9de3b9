"""SparkSession builder tuned for this engine.

Local mode mirrors the driver harness (local[$SPARK_GRAFT_CPUS]); the
config block is what we would ship to a real cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), UTC session
timezone (deterministic date formatting), Arrow enabled for the
Pandas-UDF paths, nested-schema pruning for the array<struct> movie model.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied both locally and (by intent) on a cluster. Values that are
#: per-deployment (shuffle partitions, memory) are chosen for local[32] in
#: get_spark(); at 100 TB you would scale spark.sql.shuffle.partitions to
#: ~2-3x total cores and rely on AQE coalescing to shrink small stages.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # collect_list aggregation benefits from object hash agg (no sort):
    "spark.sql.execution.useObjectHashAggregateExec": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # runtime row-level join pruning: inject a bloom filter built from the
    # small (pre-filtered) side of a shuffle join into the big side's scan,
    # so fact rows that cannot match never enter the shuffle — the 100 TB
    # complement of the plan-time dimension pushdowns (join_multiway).
    # NB: do NOT add spark.sql.optimizer.runtimeFilter.semiJoinReduction
    # here — on pyspark 4.1.2 that (removed) key poisons the session: every
    # later conf.set/read spins forever in exception conversion.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def get_spark(app_name: str = "movie-data-transformer-spark") -> SparkSession:
    """Build (or reuse) the session. Honors SPARK_GRAFT_CPUS like the driver."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally provided session
    (the driver hands us its own SparkSession in __spark_entry__)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep the session's value
    return spark
