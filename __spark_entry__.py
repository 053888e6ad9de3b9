"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Registry entries are grouped by SURVEY.md §2 / §7 milestone; each query is
implemented in movie_data_transformer_spark/ and re-exported here as a
(spark, sf_dir) -> DataFrame callable with a matching ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark import registry
from movie_data_transformer_spark.fixtures import derive_movies
from movie_data_transformer_spark.operators.movie_pipeline import run_pipeline
from movie_data_transformer_spark.session import apply_engine_conf

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full dataflow (JSONL-shaped nested movies
    -> explode -> dedup-latest -> group per customer -> KV JSON rows) on
    sf0.001. Driver checks rows > 0."""
    apply_engine_conf(spark)
    return run_pipeline(derive_movies(spark, SF0001))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops -> rows-only check)."""
    return registry.oracles()
