"""Range-clustered lake layout: repartitionByRange + sortWithinPartitions
gives parquet files with tight min/max ranges, so selective filters skip
most files via row-group statistics (the poor man's Z-ORDER on one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def test_range_clustered_write_skips_files(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    clustered = str(tmp_path / "orders_clustered")
    (
        o.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(clustered)
    )
    back = spark.read.parquet(clustered)
    assert back.count() == o.count()

    # a narrow price band must touch FEW files under range clustering
    narrow = back.filter((F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 110000))
    touched = narrow.select(F.input_file_name()).distinct().count()
    total_files = back.select(F.input_file_name()).distinct().count()
    assert total_files >= 6
    assert touched <= 2, f"clustered layout touched {touched}/{total_files} files"
    # sanity: the same filter on the unclustered source reads everything
    # (single original file), values agree
    want = o.filter(
        (F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 110000)
    ).count()
    assert narrow.count() == want
