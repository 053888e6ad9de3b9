"""The last two Python extension surfaces, bound to expression oracles.

The engine's discipline is JVM expressions in every hot path; Python
enters only Arrow-batched (pandas UDF/UDAF/UDTF, applyInPandas,
applyInPandasWithState, mapInPandas, Python DataSource — all already
oracle- or test-bound). Two official surfaces remained unexercised:

- the Arrow-OPTIMIZED scalar Python UDF (`@udf(useArrow=True)` — Arrow
  transfer without the pandas wrapper; the recommended form of the
  classic scalar UDF since Spark 3.5), and
- `mapInArrow` (raw pyarrow.RecordBatch streams — the zero-copy floor
  below mapInPandas, the right hatch when the Python side is itself
  Arrow-native, e.g. handing batches to a tokenizer or a vector lib).

Each entry computes something an expression could also compute and is
held to THAT oracle, so the claim "the escape hatch returns the same
answers as the engine" is hash-checked. Hot paths still use neither.

Scale: both are executor-side batch pipes (no driver involvement, no
per-row Python calls in mapInArrow; the scalar UDF pays per-row Python
but ships columns as Arrow). The aggregates behind them are ordinary
partial-agg shuffles at group grain.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table


def q_udf_arrow_scalar_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang token totals where the per-doc count comes from an
    Arrow-optimized scalar Python UDF replicating the engine's
    tokens() = split(trim(text), '\\s+') semantics exactly — including
    the three places Python's defaults silently diverge: SQL trim()
    strips only ASCII spaces (str.strip() eats all Unicode whitespace),
    Java/DuckDB \\s is the ASCII class [ \\t\\n\\x0B\\f\\r] (Python re
    \\s is Unicode-wide), and NULL text must yield NULL, not crash.
    Like both engines, splitting '' yields [''] — count 1."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.udf("bigint", useArrow=True)
    def py_token_count(s: str | None) -> int | None:
        if s is None:
            return None
        return len(ws.split(s.strip(" ")))

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", py_token_count("text").alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
    )


SQL_UDF_ARROW_SCALAR_TOKENS = r"""
WITH toks AS (
    SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(t)) AS BIGINT) AS sum_tokens
FROM toks GROUP BY lang
"""


def q_udf_map_in_arrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source char/byte totals where the per-doc lengths come from a
    mapInArrow pass (pyarrow.compute on raw RecordBatches — no pandas
    materialization, no per-row Python)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            t = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("source")),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(pc.binary_length(t), pa.int64()),
                ],
                names=["source", "n_chars_c", "n_bytes"],
            )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = docs.mapInArrow(
        lengths, "source string, n_chars_c bigint, n_bytes bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars_c").cast("bigint").alias("sum_chars"),
        F.sum("n_bytes").cast("bigint").alias("sum_bytes"),
    )


# DuckDB: length() = characters, strlen() = utf8 bytes — the same pair
# pyarrow spells utf8_length / binary_length.
SQL_UDF_MAP_IN_ARROW_BYTES = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
FROM documents GROUP BY source
"""


QUERIES = {
    "udf_arrow_scalar_tokens": (q_udf_arrow_scalar_tokens, SQL_UDF_ARROW_SCALAR_TOKENS),
    "udf_map_in_arrow_bytes": (q_udf_map_in_arrow_bytes, SQL_UDF_MAP_IN_ARROW_BYTES),
}
