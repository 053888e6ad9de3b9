"""CSV/ORC source connectors: planted failure modes + scan hygiene."""

from __future__ import annotations

from movie_data_transformer_spark.operators.format_queries import (
    CSV_SCHEMA,
    csv_fixture_dir,
    orc_fixture_dir,
    read_customer_csv,
)
from movie_data_transformer_spark.sources.tables import load_table


def test_csv_scan_drops_exactly_the_planted_rows(spark, sf_dir):
    d = csv_fixture_dir(spark, sf_dir)
    got = read_customer_csv(spark, d)
    clean = load_table(spark, sf_dir, "customer").count()
    # both malformed rows dropped, decoy file skipped -> exact row parity.
    # NOTE: a full-row parse (collect) is required here — a bare count()
    # lets the CSV parser skip field parsing entirely (column pruning),
    # so DROPMALFORMED never sees the malformed tokens and the raw line
    # count (clean + 2) comes back. Pinned below so the caveat stays
    # documented-by-test.
    assert len(got.collect()) == clean
    assert got.count() == clean + 2  # pruned count() counts raw lines
    assert got.filter("c_custkey = 424242").count() == 0  # decoy absent
    # same pruning caveat, projection form: a filter touching only the
    # columns the short row DOES have parses cleanly, so the row shows up;
    # referencing a missing column (acctbal_cents) re-detects the arity
    # error and drops it
    assert got.filter("c_custkey = 99 AND c_name = 'short row'").count() == 1
    assert (
        got.filter(
            "c_custkey = 99 AND c_name = 'short row' AND acctbal_cents IS NOT NULL"
        ).count()
        == 0
    )
    assert [
        r.c_custkey for r in got.collect() if r.c_name == "short row"
    ] == []  # full-row parse drops it


def test_csv_glob_filter_is_what_excludes_the_decoy(spark, sf_dir):
    """Without the *.csv glob the decoy's valid line IS readable — proving
    the suffix filter (not luck) excludes it in the entry."""
    d = csv_fixture_dir(spark, sf_dir)
    unfiltered = (
        spark.read.schema(CSV_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("header", "false")
        .csv(d + "/*")
    )
    assert unfiltered.filter("c_custkey = 424242").count() == 1


def test_orc_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    d = orc_fixture_dir(spark, sf_dir)
    df = spark.read.orc(d).filter("c_nationkey = 3").select("c_custkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(c_nationkey), EqualTo(c_nationkey,3)" in plan
    # projection pruned to the two referenced columns at the scan
    assert "ReadSchema: struct<c_custkey:bigint,c_nationkey:bigint>" in plan


def test_orc_roundtrip_values(spark, sf_dir):
    d = orc_fixture_dir(spark, sf_dir)
    got = spark.read.orc(d)
    src = load_table(spark, sf_dir, "customer")
    assert got.count() == src.count()
    # exact integer cents survive: spot-check the total
    want = src.selectExpr(
        "CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) s"
    ).collect()[0].s
    assert got.selectExpr("CAST(sum(acctbal_cents) AS BIGINT) s").collect()[0].s == want
