"""File-format source connectors beyond parquet/JSONL: CSV (with the
reference's full listing/decode failure-mode battery replayed in a second
text format) and ORC (the second columnar format Spark ships natively).

Reference analog: the engine's only ingest path is the hand-rolled S3
JSONL listing+decode (DataTransformationService.java:78-94,131-144).
A user switching engines expects the standard format matrix, so these
entries put CSV and ORC behind the same oracle gate as every other
source: the fixture is DERIVED from the customer parquet table by a
distributed Spark write, so the round-trip (project -> write format X ->
list -> filtered glob -> typed decode -> DataFrame) is hash-equal to
projecting the source table directly — iff listing filter, malformed-row
policy, and type mapping are all exactly right.

Planted failure modes (CSV):
- `README.txt` decoy containing a syntactically valid CSV line — the
  `pathGlobFilter=*.csv` suffix filter must skip the file (op 2's
  `.json`-suffix semantic, in CSV form);
- one row with a non-numeric key and one wrong-arity row appended to a
  data file — `mode=DROPMALFORMED` must drop exactly those rows (op 15's
  permissive row-level error semantic).

Money survives the text round-trip EXACTLY by shipping integer cents
(CAST(DECIMAL(12,2) * 100 AS BIGINT)) instead of a double: no
float-format/parse dependency in the fixture bytes at all.

Scale: the fixture build is a one-time distributed write (no driver
collect); the reads are plain multi-file scans that split and
schedule like any file source. ORC keeps column pruning + predicate
pushdown (verified in tests/test_format_sources.py).

Engine caveat (pinned by test): under DROPMALFORMED, queries that parse
no columns (a bare count()) skip field parsing via CSV column pruning
and therefore count raw lines INCLUDING malformed ones; any full-row
read (the driver's collect, a projection of all columns) drops them.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.operators.jsonl_queries import (
    publish_fixture_dir,
    source_fingerprint,
)
from movie_data_transformer_spark.sources.tables import load_table

#: the projection shipped through both formats — exact (integer cents)
_PROJ = [
    "CAST(c_custkey AS BIGINT) AS c_custkey",
    "c_name",
    "CAST(c_nationkey AS BIGINT) AS c_nationkey",
    "c_mktsegment",
    "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acctbal_cents",
]

CSV_SCHEMA = (
    "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, "
    "c_mktsegment STRING, acctbal_cents BIGINT"
)

_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_name,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acctbal_cents
FROM customer
"""


def _projected_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").selectExpr(*_PROJ)


def _staged_format_write(df: DataFrame, out: str, fmt: str, ext: str) -> None:
    """Distributed 4-part write of `df` as `fmt`, renamed to stable
    customer_{i}.{ext} names (listing order = sorted part order, like the
    reference's S3 objects)."""
    stage = out + "_stage"
    writer = df.repartition(4).write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "false")
    getattr(writer, fmt)(stage)
    for i, p in enumerate(sorted(globmod.glob(os.path.join(stage, f"part-*.{ext}")))):
        shutil.move(p, os.path.join(out, f"customer_{i}.{ext}"))
    shutil.rmtree(stage, ignore_errors=True)


def csv_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Cached-per-(sf, source-fingerprint) CSV fixture: 4 part files with
    stable names + the planted decoy/malformed rows."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(
        tempfile.gettempdir(), f"mdt_csv_v1_{tag}_{source_fingerprint(sf_dir)}"
    )

    def _build(out: str) -> None:
        _staged_format_write(_projected_customer(spark, sf_dir), out, "csv", "csv")
        with open(os.path.join(out, "customer_0.csv"), "a") as f:
            f.write("not_a_number,Bad Row,7,AUTOMOBILE,123\n")  # key fails BIGINT
            f.write("99,short row\n")  # wrong arity
        with open(os.path.join(out, "README.txt"), "w") as f:
            f.write("424242,Decoy Customer,1,MACHINERY,100\n")  # valid line, wrong suffix

    return publish_fixture_dir(_build, d)


def read_customer_csv(spark: SparkSession, path: str) -> DataFrame:
    """Typed CSV scan with the engine's listing+decode policy: `*.csv`
    suffix filter, declared schema, malformed rows dropped."""
    return (
        spark.read.schema(CSV_SCHEMA)
        .option("pathGlobFilter", "*.csv")
        .option("mode", "DROPMALFORMED")
        .option("header", "false")
        .csv(path)
    )


def q_source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_customer_csv(spark, csv_fixture_dir(spark, sf_dir))


def orc_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(
        tempfile.gettempdir(), f"mdt_orc_v1_{tag}_{source_fingerprint(sf_dir)}"
    )

    def _build(out: str) -> None:
        _staged_format_write(_projected_customer(spark, sf_dir), out, "orc", "orc")

    return publish_fixture_dir(_build, d)


def q_source_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.orc(orc_fixture_dir(spark, sf_dir))


def xml_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Spark 4's NATIVE XML source (spark-xml merged upstream): the
    third text format in the matrix."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(
        tempfile.gettempdir(), f"mdt_xml_v1_{tag}_{source_fingerprint(sf_dir)}"
    )

    def _build(out: str) -> None:
        stage = out + "_stage"
        (
            _projected_customer(spark, sf_dir)
            .repartition(4)
            .write.mode("overwrite")
            .format("xml")
            .option("rowTag", "customer")
            .save(stage)
        )
        for i, p in enumerate(sorted(globmod.glob(os.path.join(stage, "part-*")))):
            shutil.move(p, os.path.join(out, f"customer_{i}.xml"))
        shutil.rmtree(stage, ignore_errors=True)

    return publish_fixture_dir(_build, d)


def q_source_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.schema(CSV_SCHEMA)  # same projection, declared types
        .format("xml")
        .option("rowTag", "customer")
        .load(xml_fixture_dir(spark, sf_dir))
    )


QUERIES = {
    "source_csv_scan": (q_source_csv_scan, _ORACLE),
    "source_orc_scan": (q_source_orc_scan, _ORACLE),
    "source_xml_scan": (q_source_xml_scan, _ORACLE),
}
