"""Engine facade: the one-stop user API.

The reference exposes no query surface at all (one hard-coded dataflow,
SURVEY.md §3); this facade is where the new engine surpasses it — every
driver table registered as a temp view + full Spark SQL, alongside the
programmatic operator library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.session import apply_engine_conf, get_spark
from movie_data_transformer_spark.sources.tables import TABLES, load_table


class MovieEngine:
    """SQL + DataFrame surface over the engine's tables.

    >>> eng = MovieEngine.connect(sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("SELECT count(*) FROM lineitem").show()
    >>> eng.table("orders").groupBy("o_orderstatus").count().show()
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = apply_engine_conf(spark)
        self.sf_dir = sf_dir
        for name in TABLES:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)

    @classmethod
    def connect(cls, sf_dir: str, spark: SparkSession | None = None) -> "MovieEngine":
        return cls(spark or get_spark("movie-engine"), sf_dir)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def queries(self):
        """The registered operator catalog (name -> callable)."""
        from movie_data_transformer_spark.registry import spark_queries

        return {
            name: (lambda fn=fn: fn(self.spark, self.sf_dir))
            for name, fn in spark_queries().items()
        }
