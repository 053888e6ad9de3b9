"""Registry entry for the one-pass table profiler (on orders)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.profile import profile_table
from movie_data_transformer_spark.sources.tables import load_table

_ORDERS_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),  # timestamp: profiled but no numeric range
    ("o_orderpriority", False),
]


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "orders"))


def _profile_orders_sql() -> str:
    parts = []
    for col, numeric in _ORDERS_COLS:
        mn = f"CAST(min({col}) AS VARCHAR)" if numeric else "NULL"
        mx = f"CAST(max({col}) AS VARCHAR)" if numeric else "NULL"
        parts.append(
            f"""SELECT '{col}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       {mn} AS min_val, {mx} AS max_val
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "profile_orders": (q_profile_orders, _profile_orders_sql()),
}
