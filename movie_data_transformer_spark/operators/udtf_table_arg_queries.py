"""The TABLE-argument Python UDTF surface (SPARK-44503, Spark 3.5+/4):
a UDTF invoked as `f(TABLE(t) PARTITION BY k ORDER BY c)` — the engine
partitions and sorts the INPUT RELATION and streams each partition's
rows through one UDTF instance. This is the custom-aggregation escape
hatch with ordering guarantees (sessionizers, sequence compressors,
order-sensitive state machines) and was the last Python-UDTF variant
not yet bound to the driver gate (plain/LATERAL UDTFs and the
analyze()-polymorphic form are oracle-checked in lm/udtf_poly).

The entry accumulates per-source stats where first_doc/last_doc record
ARRIVAL ORDER inside the UDTF — the oracle's min/max only agree because
the engine honors PARTITION BY source ORDER BY doc_id, so the hash binds
the partition-and-order delivery contract itself, not just the sums.
Only exact integers cross the Python boundary (no tokenization or FP in
Python — the r5 lesson: keep Python semantics trivially alignable).

Scale: one shuffle on the partition key + per-partition sort; the UDTF
runs Arrow-batched per partition. Registered behind the committed
r07/r08 windows (NOTES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table


def q_udtf_table_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "source string, n_docs bigint, sum_chars bigint,"
            " first_doc bigint, last_doc bigint"
        )
    )
    class SourceAccumulator:
        def __init__(self) -> None:
            self.source = None
            self.n = 0
            self.chars = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.source = row["source"]
            self.n += 1
            self.chars += int(row["n_chars"])
            if self.first is None:
                self.first = int(row["doc_id"])  # arrival order matters
            self.last = int(row["doc_id"])

        def terminate(self):
            if self.source is not None:
                yield self.source, self.n, self.chars, self.first, self.last

    spark.udtf.register("mdt_source_accumulator", SourceAccumulator)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_uta_docs")
    return spark.sql(
        """
        SELECT * FROM mdt_source_accumulator(
            TABLE(SELECT doc_id, source, n_chars FROM _uta_docs)
            PARTITION BY source ORDER BY doc_id
        )
        """
    )


SQL_UDTF_TABLE_PARTITIONED = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM documents
GROUP BY source
"""


QUERIES = {
    "udtf_table_partitioned": (q_udtf_table_partitioned, SQL_UDTF_TABLE_PARTITIONED),
}
