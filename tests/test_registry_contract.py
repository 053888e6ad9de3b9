"""The driver contract itself: registry consistency + plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_registry_consistent_without_session():
    # imports and builds WITHOUT touching any SparkSession
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert len(qs) >= 70
    assert set(os_) <= set(qs)  # every oracle belongs to a query
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())
    rows_only = set(qs) - set(os_)
    # rows-only is the exception, not the rule: approximate ANN (ivf/lsh/
    # pq/semdedup), sketches, iterative fixpoints (pagerank), procedural
    # packing, pandas-UDF/UDAF paths, incremental streaming. Each one has
    # a recall/golden/invariant pytest instead.
    assert len(rows_only) <= 12, rows_only
    # and the oracle-checked majority keeps growing, never shrinks
    assert len(os_) >= 100


def test_q6_pushes_filters_to_scan(spark, sf_dir):
    from movie_data_transformer_spark.operators.tpch_queries import q_tpch_q6_forecast_revenue

    df = q_tpch_q6_forecast_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # discount/quantity predicates must reach the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_discount" in plan.split("PushedFilters: [", 1)[1][:300]


def test_all_queries_have_lowercase_unique_columns(spark, sf_dir):
    """Column-name discipline: the driver sorts by name before hashing —
    duplicated or case-colliding names would corrupt the comparison."""
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        cols = fn(spark, sf_dir).columns
        assert len(cols) == len({c.lower() for c in cols}), f"{name}: {cols}"
