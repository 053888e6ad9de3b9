"""Table profiling — the data-quality sweep a pipeline runs before
training-data ingestion: per-column null counts, distinct counts, and
numeric ranges, computed in ONE pass (single aggregate, no per-column
jobs — at 100 TB a profile must not rescan the table per column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max (numeric
    columns; rendered as strings for a uniform schema)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for f in df.schema.fields:
        c = f.name
        out.append(
            (
                c,
                row["_n"],
                row[f"{c}__nulls"],
                row[f"{c}__distinct"],
                row[f"{c}__min"] if f"{c}__min" in row.asDict() else None,
                row[f"{c}__max"] if f"{c}__max" in row.asDict() else None,
            )
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, min_val string, max_val string",
    )
