"""Partitioned parquet table sink — the lake-layout companion to the KV
sink: write fact data partitioned by a low-cardinality key so downstream
scans prune at planning time.

100 TB note: partition by coarse time (year/month) or enum columns only —
high-cardinality partition keys (customer ids!) create a small-files
catastrophe. Within partitions rely on parquet row-group statistics +
filter pushdown for finer pruning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_partitioned_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    partition_cols: list[str],
    bucket_col: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """The combined lake layout: coarse partitions (time/enum) for
    planner-time pruning PLUS hash buckets on the join/merge key inside
    each partition for shuffle-free joins.

    100 TB note: this is the state-table layout for incremental merges —
    a date-partitioned, key-bucketed table lets a daily MERGE prune to
    one partition AND join against the batch without shuffling the
    (huge) state side. Buckets must be sized so each bucket file stays
    in the 128 MB - 1 GB band; n_buckets is fixed at table creation, so
    pick it for the TARGET size, not today's.
    """
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table_name)
    )
