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
