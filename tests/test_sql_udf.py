"""SQL UDF surface: Catalyst inlining and span-arithmetic goldens."""

from __future__ import annotations

from movie_data_transformer_spark.operators.sql_udf_queries import (
    CHUNK,
    q_sql_udf_scalar_bands,
)


def test_scalar_sql_udf_is_inlined(spark, sf_dir):
    """The whole point of SQL UDFs: the body inlines into the caller's
    plan. The executed plan must contain ordinary CASE/DIV expressions
    and NO python-udf / eval operator of any kind."""
    df = q_sql_udf_scalar_bands(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
    # the band CASE folded into a projection (inlined, not a black box)
    analyzed = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CASE WHEN" in analyzed and "short" in analyzed


def test_table_sql_udf_chunk_goldens(spark):
    """Golden spans on literal docs: a doc of 2*CHUNK+5 chars yields
    three chunks (CHUNK, CHUNK, 5); an exact-multiple doc has no runt
    chunk; reassembling the chunk texts restores the original."""
    docs = spark.createDataFrame(
        [
            (1, "a" * (2 * CHUNK + 5), "en", 2 * CHUNK + 5),
            (2, "b" * CHUNK, "en", CHUNK),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    docs.createOrReplaceTempView("_squ_docs")
    # drive the registered function through the same SQL as the entry
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
    rows = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.start_pos, c.chunk_len,
               substring(d.text, CAST(c.start_pos + 1 AS INT),
                         CAST(c.chunk_len AS INT)) AS chunk_text
        FROM _squ_docs d, LATERAL f_chunk_spans(d.n_chars, {CHUNK}) c
        ORDER BY d.doc_id, c.chunk_id
        """
    ).collect()
    d1 = [r for r in rows if r.doc_id == 1]
    assert [r.chunk_len for r in d1] == [CHUNK, CHUNK, 5]
    assert [r.start_pos for r in d1] == [0, CHUNK, 2 * CHUNK]
    assert "".join(r.chunk_text for r in d1) == "a" * (2 * CHUNK + 5)
    d2 = [r for r in rows if r.doc_id == 2]
    assert [r.chunk_len for r in d2] == [CHUNK]


def test_table_sql_udf_zero_length_doc_yields_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", 0)], "doc_id long, text string, lang string, n_chars long"
    )
    docs.createOrReplaceTempView("_squ_docs")
    spark.sql(
        """
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
    got = spark.sql(
        "SELECT d.doc_id, c.chunk_id FROM _squ_docs d, "
        "LATERAL f_chunk_spans(d.n_chars, 97) c"
    ).collect()
    assert got == []
