"""Registry entry for the Python DataSource connector (sources/
pydatasource.py): scan a *custom* partitioned source and aggregate it.

The generator's fields are pure integer arithmetic on the global row id,
so DuckDB's range(n) reproduces the scan exactly — the one way to put a
custom connector behind the same oracle gate as every file-backed query.
(Reference analog: the hand-rolled S3 listing + JSONL decode at
DataTransformationService.java:78-94,131-144 — here the source IS the
pluggable API, and Spark schedules its partitions() like file splits.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.pydatasource import register_datasources

N_ROWS = 5000
N_PARTS = 8


def q_source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-movie rating stats over the synthetic_ratings custom source.
    (sf_dir is unused: the source generates its own partitioned data —
    the point is the connector, not the corpus.)"""
    register_datasources(spark)
    src = (
        spark.read.format("synthetic_ratings")
        .option("rows", N_ROWS)
        .option("partitions", N_PARTS)
        .load()
    )
    return src.groupBy("movie_id").agg(
        F.count("*").alias("n_ratings"),
        F.sum("rating").cast("bigint").alias("sum_rating"),
        F.countDistinct("customer_id").alias("n_customers"),
        F.min("rating_date").alias("first_date"),
        F.max("rating_date").alias("last_date"),
    )


SQL_SOURCE_PYTHON_DATASOURCE = f"""
WITH src AS (
    SELECT i AS rating_id,
           (i * 2654435761) % 97 AS customer_id,
           (i * 40503) % 61 AS movie_id,
           CAST(1 + (i * 7919) % 5 AS INT) AS rating,
           DATE '2024-01-01' + CAST(i % 365 AS INT) AS rating_date
    FROM range(0, {N_ROWS}) t(i)
)
SELECT movie_id, CAST(count(*) AS BIGINT) AS n_ratings,
       CAST(sum(rating) AS BIGINT) AS sum_rating,
       CAST(count(DISTINCT customer_id) AS BIGINT) AS n_customers,
       min(rating_date) AS first_date,
       max(rating_date) AS last_date
FROM src
GROUP BY 1
"""


QUERIES = {
    "source_python_datasource": (
        q_source_python_datasource,
        SQL_SOURCE_PYTHON_DATASOURCE,
    ),
}
