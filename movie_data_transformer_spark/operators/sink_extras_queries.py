"""Round-6 sink extension: the Python DataSource WRITER surface put
behind the driver's oracle gate. The kv_text sink (sources/
pydatasource.py) implements the task-write -> driver-commit protocol
(private temp file per task attempt, commit renames all-or-nothing,
abort deletes) — exactly-once output from at-least-once attempts, the
correctness property the reference's per-key Redis RMW lacks. The
read-back here parses the committed `key\\tvalue` lines and is held to
a recompute-from-source oracle, so a commit that drops, duplicates, or
mis-formats ANY task's rows breaks the driver hash.

Scale: the write streams per task (one handle per task, no driver
data); commit is O(#tasks) renames. Output dir is per-invocation and
registered for process-exit cleanup (the harness stable-dir contract).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.pydatasource import register_datasources
from movie_data_transformer_spark.sources.tables import load_table
from movie_data_transformer_spark.streaming.harness import register_cleanup_dir


def q_sink_pydatasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_datasources(spark)
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.md5("text").alias("value"),
    )
    out = register_cleanup_dir(tempfile.mkdtemp(prefix="mdt_pyds_sink_"))
    kv.write.format("kv_text").option("path", out).mode("append").save()
    lines = spark.read.text(os.path.join(out, "*"))
    return lines.selectExpr(
        "CAST(split(value, '\t')[0] AS BIGINT) AS doc_id",
        "split(value, '\t')[1] AS text_md5",
    )


SQL_SINK_PYDATASOURCE_ROUNDTRIP = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""


QUERIES = {
    "sink_pydatasource_roundtrip": (
        q_sink_pydatasource_roundtrip,
        SQL_SINK_PYDATASOURCE_ROUNDTRIP,
    ),
}
