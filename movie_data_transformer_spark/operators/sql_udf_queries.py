"""Spark 4 SQL user-defined functions (SQL UDFs) as oracle-checked ops.

CREATE [TEMPORARY] FUNCTION ... RETURN <expr> / RETURNS TABLE ... is the
catalog-native extension surface (SPARK-46246, GA in Spark 4): the
function BODY is SQL, so Catalyst inlines it into the calling plan —
unlike Python UDFs there is no serialization boundary, no Arrow batch
hop, and the inlined expressions participate in predicate pushdown,
constant folding, and whole-stage codegen exactly like hand-written
expressions. That makes SQL UDFs the right home for shared business
logic at 100 TB (one definition, optimizer-transparent at every call
site), and the LAST extension surface this engine had not yet bound to
the driver's oracle gate (Python scalar/UDAF/UDTF/Arrow forms are all
oracle-checked in udf_surface/udtf_poly/grouped_extras).

Two entries:
- a SCALAR pipeline: length-band categorization + exact floor-micro
  share, both declared as SQL UDFs and composed in one aggregation —
  the oracle inlines the same expressions, so the hash also proves the
  inlining changed nothing semantically;
- a TABLE-VALUED function applied via correlated LATERAL join — the
  set-returning form (chunk spans per document), held to a DuckDB
  generate_series oracle with the chunk text md5-bound.

Both are pure engine-side SQL: zero Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

CHUNK = 97  # prime chunk size exercises every remainder class


def q_sql_udf_scalar_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, length-band) doc counts with each band's exact
    floor-micro share of its lang total, where the band rule AND the
    share arithmetic live in named SQL UDFs. Both are inlined by
    Catalyst: the executed plan is identical to writing the CASE and the
    DIV chain inline (asserted in tests/test_sql_udf.py), so the
    function boundary costs nothing at any scale."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_squ_docs")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION f_len_band(n BIGINT)
        RETURNS STRING
        RETURN CASE WHEN n < 200 THEN 'short'
                    WHEN n < 600 THEN 'medium'
                    ELSE 'long' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION f_micro_share(part BIGINT, total BIGINT)
        RETURNS BIGINT
        RETURN CASE WHEN total = 0 THEN NULL
                    ELSE (part * CAST(1000000 AS BIGINT)) DIV total END
        """
    )
    return spark.sql(
        """
        WITH bands AS (
            SELECT lang, f_len_band(n_chars) AS len_band FROM _squ_docs
        ),
        counts AS (
            SELECT lang, len_band, CAST(count(*) AS BIGINT) AS n_docs
            FROM bands GROUP BY lang, len_band
        )
        SELECT lang, len_band, n_docs,
               f_micro_share(n_docs, sum(n_docs) OVER (PARTITION BY lang))
                   AS share_micro
        FROM counts
        """
    )


SQL_SQL_UDF_SCALAR_BANDS = """
WITH bands AS (
    SELECT lang,
           CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 600 THEN 'medium'
                ELSE 'long' END AS len_band
    FROM documents
),
counts AS (
    SELECT lang, len_band, CAST(count(*) AS BIGINT) AS n_docs
    FROM bands GROUP BY lang, len_band
)
SELECT lang, len_band, n_docs,
       CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
           AS share_micro
FROM counts
"""


def q_sql_udf_table_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-span chunking as a TABLE-VALUED SQL UDF applied with a
    correlated LATERAL join: one span row per CHUNK-char window of each
    doc, the chunk text md5-bound so span arithmetic that drifts off by
    one breaks the hash. The function body is plain SQL (explode over a
    guarded sequence), so the lateral expands engine-side like any
    generator — no UDTF worker, no Python. At 100 TB this is the
    shardable document-chunking primitive (rows fan out map-side; no
    shuffle until a consumer aggregates)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_squ_docs")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION f_chunk_spans(n BIGINT, sz BIGINT)
        RETURNS TABLE (chunk_id BIGINT, start_pos BIGINT, chunk_len BIGINT)
        RETURN SELECT i, i * sz, least(sz, n - i * sz)
        FROM (SELECT explode(CASE WHEN n <= 0
                                  THEN CAST(array() AS ARRAY<BIGINT>)
                                  ELSE sequence(CAST(0 AS BIGINT),
                                                (n + sz - 1) DIV sz - 1)
                             END) AS i)
        """
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.start_pos, c.chunk_len,
               md5(substring(d.text, CAST(c.start_pos + 1 AS INT),
                             CAST(c.chunk_len AS INT))) AS chunk_md5
        FROM _squ_docs d, LATERAL f_chunk_spans(d.n_chars, {CHUNK}) c
        """
    )


SQL_SQL_UDF_TABLE_CHUNKS = f"""
WITH spans AS (
    SELECT doc_id, text,
           unnest(generate_series(0,
               CAST((n_chars + {CHUNK - 1}) // {CHUNK} AS BIGINT) - 1)) AS chunk_id,
           n_chars
    FROM documents
    WHERE n_chars > 0
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {CHUNK} AS BIGINT) AS start_pos,
       CAST(least({CHUNK}, n_chars - chunk_id * {CHUNK}) AS BIGINT) AS chunk_len,
       md5(substr(text, CAST(chunk_id * {CHUNK} + 1 AS BIGINT),
                  least({CHUNK}, n_chars - chunk_id * {CHUNK}))) AS chunk_md5
FROM spans
"""


QUERIES = {
    "sql_udf_scalar_bands": (q_sql_udf_scalar_bands, SQL_SQL_UDF_SCALAR_BANDS),
    "sql_udf_table_chunks": (q_sql_udf_table_chunks, SQL_SQL_UDF_TABLE_CHUNKS),
}
