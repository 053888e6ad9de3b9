"""Dataset-card reporting and curriculum phasing — the two artifacts a
training run consumes AFTER curation: the per-source datacard (the
"datasheets for datasets" summary row: volume, duplication, language
mix, difficulty) and a curriculum phase assignment (easy -> hard
ordering by readability grade, Bengio et al. 2009 curriculum learning).
Both are COMPOSITIONS of shipped primitives — the readability counts
are imported from readability_queries so the two surfaces can never
drift apart.

Entries (both FULL DuckDB oracles, exact bigint/micro arithmetic):
- `datacard_by_source`: per source — n_docs, n_tokens, n_unique_texts
  (distinct md5 of raw text), dup_rate_micro (1 - unique/docs),
  pct_en_micro, mean_chars, mean_fkgl_micro.
- `curriculum_phase_assign`: per (phase, lang) — FKGL thresholds
  phase1 < 8, phase2 < 12, phase3 else — n_docs, mean_fkgl_micro,
  mean_tokens. A trainer reads phases in order.

Scale: both are one documents scan + one small-domain groupBy
(map-side combinable except the distinct-text count, which is a
(source, digest) pre-agg — the dedup_exact shape; swap to HLL/KMV per
the datasketches family if exactness can relax). No joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.readability_queries import (
    _COUNTS_SPARK,
    _FKGL,
)
from movie_data_transformer_spark.sources.tables import load_table

#: DuckDB twin of the fused per-doc fact projection
_FACTS_CTE = r"""
facts AS (
    SELECT source, lang, n_chars, md5(text) AS digest,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w,
           CAST(greatest(1, len(list_filter(
                string_split_regex(text, '[.!?]+'),
                s -> length(trim(s)) > 0))) AS BIGINT) AS s,
           CAST(list_sum(list_transform(
                string_split_regex(trim(lower(text)), '\s+'),
                x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+')))))
               AS BIGINT) AS y
    FROM documents
)"""


def _facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "source", "lang", "n_chars", "md5(text) AS digest", *_COUNTS_SPARK
    )


def q_datacard_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).withColumn(
        "fkgl_micro", F.expr(f"CAST({_FKGL.format(div='DIV')} AS BIGINT)")
    )
    return (
        facts.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_tokens"),
            F.countDistinct("digest").cast("bigint").alias("n_unique_texts"),
            F.sum(F.expr("IF(lang = 'en', 1, 0)")).cast("bigint").alias("_en"),
            F.sum("n_chars").cast("bigint").alias("_chars"),
            F.sum("fkgl_micro").cast("bigint").alias("_fkgl"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            "n_unique_texts",
            "CAST((n_docs - n_unique_texts) * 1000000 DIV n_docs AS BIGINT)"
            " AS dup_rate_micro",
            "CAST(_en * 1000000 DIV n_docs AS BIGINT) AS pct_en_micro",
            "CAST(_chars DIV n_docs AS BIGINT) AS mean_chars",
            "CAST(_fkgl DIV n_docs AS BIGINT) AS mean_fkgl_micro",
        )
    )


SQL_DATACARD_BY_SOURCE = f"""
WITH {_FACTS_CTE},
scored AS (
    SELECT *, CAST({_FKGL.format(div='//')} AS BIGINT) AS fkgl_micro
    FROM facts
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT digest) AS BIGINT) AS n_unique_texts,
       CAST((count(*) - count(DISTINCT digest)) * 1000000 // count(*)
            AS BIGINT) AS dup_rate_micro,
       CAST(count(*) FILTER (lang = 'en') * 1000000 // count(*) AS BIGINT)
           AS pct_en_micro,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars,
       CAST(sum(fkgl_micro) // count(*) AS BIGINT) AS mean_fkgl_micro
FROM scored
GROUP BY source
"""

_PHASE = """CASE WHEN fkgl_micro < 8000000 THEN 1
     WHEN fkgl_micro < 12000000 THEN 2
     ELSE 3 END"""


def q_curriculum_phase_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    facts = _facts(spark, sf_dir).withColumn(
        "fkgl_micro", F.expr(f"CAST({_FKGL.format(div='DIV')} AS BIGINT)")
    )
    return (
        facts.selectExpr("lang", "w", "fkgl_micro", f"{_PHASE} AS phase")
        .groupBy("phase", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("fkgl_micro").cast("bigint").alias("_fkgl"),
            F.sum("w").cast("bigint").alias("_w"),
        )
        .selectExpr(
            "CAST(phase AS BIGINT) AS phase",
            "lang",
            "n_docs",
            "CAST(_fkgl DIV n_docs AS BIGINT) AS mean_fkgl_micro",
            "CAST(_w DIV n_docs AS BIGINT) AS mean_tokens",
        )
    )


SQL_CURRICULUM_PHASE_ASSIGN = f"""
WITH {_FACTS_CTE},
scored AS (
    SELECT *, CAST({_FKGL.format(div='//')} AS BIGINT) AS fkgl_micro
    FROM facts
),
phased AS (
    SELECT lang, w, fkgl_micro, {_PHASE} AS phase FROM scored
)
SELECT CAST(phase AS BIGINT) AS phase,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fkgl_micro) // count(*) AS BIGINT) AS mean_fkgl_micro,
       CAST(sum(w) // count(*) AS BIGINT) AS mean_tokens
FROM phased
GROUP BY 1, 2
"""


QUERIES = {
    "datacard_by_source": (q_datacard_by_source, SQL_DATACARD_BY_SOURCE),
    "curriculum_phase_assign": (
        q_curriculum_phase_assign,
        SQL_CURRICULUM_PHASE_ASSIGN,
    ),
}
