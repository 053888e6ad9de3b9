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


def test_binaryfile_scan_lists_only_wavs_and_binds_length(spark, sf_dir):
    from movie_data_transformer_spark.operators.format_queries import (
        WAV_SUBSET_MOD,
        binaryfile_fixture_dir,
        q_source_binaryfile_scan,
    )

    d = binaryfile_fixture_dir(spark, sf_dir)
    # decoy README.txt is on disk but excluded by the *.wav glob
    all_files = spark.read.format("binaryFile").load(d)
    wavs = spark.read.format("binaryFile").option("pathGlobFilter", "*.wav").load(d)
    n_subset = (
        load_table(spark, sf_dir, "documents")
        .filter(f"doc_id % {WAV_SUBSET_MOD} = 0")
        .count()
    )
    # README.txt rides alongside the wav objects (the _DONE cache marker
    # is invisible even unglobbed: Hadoop's default PathFilter hides
    # underscore-prefixed names, same as _SUCCESS)
    assert all_files.count() == n_subset + 1
    assert wavs.count() == n_subset

    out = q_source_binaryfile_scan(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n_subset
    # the length METADATA column equals the real blob size and the
    # canonical 44-byte-header formula for every file
    for r in rows:
        assert r.file_bytes == 44 + 2 * r.n_samples


def test_binaryfile_content_matches_ondisk_bytes(spark, sf_dir):
    """The source's content column is the raw object: re-reading one file
    from disk byte-equals what the scan handed the decoder."""
    from movie_data_transformer_spark.operators.format_queries import (
        binaryfile_fixture_dir,
    )

    d = binaryfile_fixture_dir(spark, sf_dir)
    row = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(d)
        .orderBy("path")
        .limit(1)
        .collect()[0]
    )
    local = row.path.removeprefix("file:")
    with open(local, "rb") as f:
        assert f.read() == bytes(row.content)
