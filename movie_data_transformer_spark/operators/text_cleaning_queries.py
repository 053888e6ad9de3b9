"""Within-document repetition REMOVAL — the transform counterpart of
text_repetition_stats (which only measures). C4/Gopher-style cleaning
collapses immediate token repeats ("batch batch batch" -> "batch")
before training; this entry emits the cleaned text fingerprint plus
before/after token counts, so the oracle binds the transform itself,
not just the counts: a wrong index base, an off-by-one in the
previous-token compare, or a join-order slip changes the md5.

Spark side: one higher-order filter over the token array — (x, i) ->
i = 0 OR x != t[i-1] — entirely JVM expressions, map-side only (the
classic hot-path discipline: no UDF for a per-row transform). DuckDB
twin: unnest + lag over (doc, position) + ordered re-aggregation.

Scale: zero shuffles; a pure projection pass that fuses into the scan.
At 100 TB this runs at parquet-read speed and is the cheapest of the
cleaning cascade's stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table


def q_text_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        r"split(trim(text), '\\s+') AS t",
    ).selectExpr(
        "doc_id",
        "CAST(size(t) AS BIGINT) AS n_tokens_before",
        # keep position 0 and every token differing from its predecessor
        "CAST(size(filter(t, (x, i) -> i = 0 OR x != t[i - 1])) AS BIGINT)"
        " AS n_tokens_after",
        "md5(concat_ws(' ', filter(t, (x, i) -> i = 0 OR x != t[i - 1])))"
        " AS clean_md5",
    )


SQL_TEXT_COLLAPSE_REPEATS = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
u AS (
    SELECT doc_id, unnest(t) AS x, generate_subscripts(t, 1) AS i FROM toks
),
kept AS (
    SELECT doc_id, x, i,
           lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM u
),
clean AS (
    SELECT doc_id, string_agg(x, ' ' ORDER BY i) AS s, count(*) AS n_after
    FROM kept WHERE prev IS NULL OR x <> prev
    GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens_before,
       CAST(c.n_after AS BIGINT) AS n_tokens_after,
       md5(c.s) AS clean_md5
FROM toks t JOIN clean c ON t.doc_id = c.doc_id
"""


QUERIES = {
    "text_collapse_repeats": (q_text_collapse_repeats, SQL_TEXT_COLLAPSE_REPEATS),
}
