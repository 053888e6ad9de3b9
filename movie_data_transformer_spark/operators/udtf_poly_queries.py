"""The POLYMORPHIC Python UDTF — dynamic output schema via analyze().

`text_chunks_udtf` (lm_queries.py) binds the static-schema UDTF; Spark 4
adds a second, strictly more powerful form where the UDTF's output
schema is computed at ANALYSIS time by a static `analyze(...)` method
from the (constant) call arguments — the mechanism behind
variable-width table functions (pivot-like explosions, configurable
feature columns). This entry splits each document's token list into
N_PARTS contiguous segments and returns them as N_PARTS **columns whose
very existence is decided by analyze()** — then holds the result to a
plain array-slicing oracle, so the dynamic-schema machinery is
hash-checked against engine expressions.

Tokenization matches the engine's split(trim(text), '\\s+') exactly
(ASCII whitespace class, ASCII-space strip — the udf_arrow_scalar_tokens
discipline); segment width is ceil(n_tokens / N_PARTS) with trailing
segments empty-string when tokens run out, which both engines express
as out-of-range array slices.

Scale: executor-side Arrow-batched generator, one row in -> one row
out, no shuffle (the LATERAL join to a table function is a map-side
Generate). Hot paths still use expressions; this binds the extension
surface for operators whose output arity is configuration-driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

N_PARTS = 3


def q_udtf_polymorphic_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @udtf
    class SplitColsPoly:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            # the output schema is built HERE, from the constant argument
            if not n.isConstantExpression:
                raise ValueError("n must be a constant")
            st = StructType()
            for i in range(int(n.value)):
                st = st.add(f"part{i}", StringType())
            return AnalyzeResult(st)

        def eval(self, text: str, n: int):
            toks = ws.split(text.strip(" ")) if text is not None else []
            per = (len(toks) + n - 1) // n
            yield tuple(
                " ".join(toks[i * per : (i + 1) * per]) for i in range(n)
            )

    spark.udtf.register("split_cols_poly", SplitColsPoly)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_poly_docs")
    parts = ", ".join(f"s.part{i}" for i in range(N_PARTS))
    return spark.sql(
        f"SELECT d.doc_id, {parts} "
        f"FROM _poly_docs d, LATERAL split_cols_poly(d.text, {N_PARTS}) s"
    )


SQL_UDTF_POLYMORPHIC_COLUMNS = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
p AS (
    SELECT doc_id, t, (len(t) + __N__ - 1) // __N__ AS per FROM toks
)
SELECT doc_id,
       array_to_string(t[1:per], ' ') AS part0,
       array_to_string(t[(per + 1):(2 * per)], ' ') AS part1,
       array_to_string(t[(2 * per + 1):(3 * per)], ' ') AS part2
FROM p
""".replace("__N__", str(N_PARTS))


QUERIES = {
    "udtf_polymorphic_columns": (
        q_udtf_polymorphic_columns,
        SQL_UDTF_POLYMORPHIC_COLUMNS,
    ),
}
