"""Partitioned table sink: round trip + partition pruning at scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from movie_data_transformer_spark.sinks.table import read_partitioned, write_partitioned
from movie_data_transformer_spark.sources.tables import load_table


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year(F.col("o_orderdate").cast("date"))
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(o, path, ["order_year"])
    # hive-style layout on disk
    years = sorted(d for d in os.listdir(path) if d.startswith("order_year="))
    assert len(years) >= 3

    back = read_partitioned(spark, path)
    assert back.count() == o.count()

    one_year = int(years[0].split("=")[1])
    q = back.filter(F.col("order_year") == one_year)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter applied at planning: scan lists only that partition
    assert "PartitionFilters" in plan and f"order_year={one_year}" not in plan.replace(
        "PartitionFilters", ""
    ) or q.count() == o.filter(F.year(F.col("o_orderdate").cast("date")) == one_year).count()
    # the definitive check: number of files touched == files in one partition dir
    n_files_partition = len(
        [f for f in os.listdir(os.path.join(path, years[0])) if f.endswith(".parquet")]
    )
    scanned = q.select(F.input_file_name()).distinct().count()
    assert scanned == n_files_partition
