"""Tokenizer fertility by language — the multilingual-tokenizer QA
metric (fertility = subwords per word; Rust et al. 2021 "How Good is
Your Tokenizer?"): a tokenizer tuned on one language inflates token
counts (and training/inference cost) on the others, and the per-lang
fertility table is how that's detected. Composes the SHIPPED fixed-BPE
encoder (operators/bpe.apply_bpe_merges with lm_queries.BPE_FIXED_MERGES
— same replace chain, same oracle discipline), so the tokenizer under
audit is exactly the one bpe_encode_fixed binds into driver hashes.

Entry `bpe_fertility_by_lang` (FULL DuckDB oracle): per lang —
n_docs, n_words, n_subwords, fertility_micro (subwords*1e6 DIV words)
and chars_per_subword_micro (n_chars*1e6 DIV subwords, the compression
view). Exact bigint micro units.

Scale: the encode is map-side (one whole-stage-codegen replace chain per
doc — the bpe_encode_fixed shape); lang and n_chars CARRY through that
projection (apply_bpe_merges' carry param), so the per-lang reduce is
ONE scan + one 5-key map-side-combinable agg — zero joins (plan-pinned
in test_plan_shapes_hold). Scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.bpe import apply_bpe_merges
from movie_data_transformer_spark.operators.lm_queries import (
    BPE_FIXED_MERGES,
    _bpe_replace_chain_sql,
)
from movie_data_transformer_spark.sources.tables import load_table


def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # lang + n_chars CARRY through the encode projection — ONE scan, no
    # join back to the document table (a doc-grain join would broadcast
    # or shuffle the whole dimension at 100 TB)
    facts = apply_bpe_merges(
        docs, BPE_FIXED_MERGES, carry=("lang", "n_chars")
    )
    return (
        facts.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            F.sum("n_chars").cast("bigint").alias("_chars"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            "CAST(n_subwords * 1000000 DIV n_words AS BIGINT)"
            " AS fertility_micro",
            "CAST(_chars * 1000000 DIV n_subwords AS BIGINT)"
            " AS chars_per_subword_micro",
        )
    )


SQL_BPE_FERTILITY_BY_LANG = f"""
WITH sym AS (
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_words,
           ' ' || array_to_string(
                    list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                                   w -> array_to_string(string_split(w, ''), ' ')),
                    ' </w>  ') || ' </w> ' AS s
    FROM documents
),
m AS (SELECT doc_id, lang, n_chars, n_words,
             {_bpe_replace_chain_sql('s')} AS s FROM sym),
enc AS (
    SELECT lang, n_chars, n_words,
           CAST(len(string_split_regex(trim(s), ' +')) AS BIGINT) AS n_subwords
    FROM m
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
       CAST(sum(n_subwords) * 1000000 // sum(n_words) AS BIGINT)
           AS fertility_micro,
       CAST(sum(n_chars) * 1000000 // sum(n_subwords) AS BIGINT)
           AS chars_per_subword_micro
FROM enc
GROUP BY lang
"""


QUERIES = {
    "bpe_fertility_by_lang": (
        q_bpe_fertility_by_lang,
        SQL_BPE_FERTILITY_BY_LANG,
    ),
}
