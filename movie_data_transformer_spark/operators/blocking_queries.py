"""Blocking-quality report for record linkage — the standard audit
(Christen 2012, "Data Matching", ch. 4) every ER team runs BEFORE
scoring: how much of the quadratic pair space does the blocking key
eliminate (reduction ratio), how many true matches does it keep
(pairs completeness), and how dense are candidates in true matches
(pairs quality). Complements er_fellegi_sunter (which SCORES the
blocked pairs, same fixture, linkage_queries.py): this entry grades
the blocking itself, turning the "blocked-out true pairs are the
textbook recall cost" note there into a measured, driver-visible
number.

Fixture: the linkage dirty-duplicates corpus — system A = clean part
rows, system B = the deterministically perturbed twins
(linkage_queries._PERTURB_*), truth = the N (key_a == key_b) pairs,
block key = (final name noun, size div 8 band).

Entry `er_blocking_quality` (FULL DuckDB oracle), one row:
  n_records, n_total_pairs (= N^2, the A x B universe),
  n_candidate_pairs (= sum over blocks of cnt_a * cnt_b),
  n_true_pairs (= N), n_true_in_candidates,
  reduction_ratio_micro  = 1e6 - n_cand * 1e6 div n_total
  pairs_completeness_micro = n_true_cand * 1e6 div n_true
  pairs_quality_micro      = n_true_cand * 1e6 div n_cand

Scale (the whole point of this operator): NO pair is ever
materialized — candidate counts come from per-block (cnt_a, cnt_b)
products (one groupBy each side + one join on block key, block-count
sized), and true-pair retention is a ROW-LOCAL comparison (each
record's perturbed twin either shares its block or not — one scan,
no join at all). The report that grades a 10^12-pair blocking plan
costs two aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.linkage_queries import (
    _PERTURB_NAME,
    _PERTURB_SIZE,
)
from movie_data_transformer_spark.sources.tables import load_table

_BLK_A = (
    "concat(element_at(split(p_name, ' '), -1), '|',"
    " CAST(p_size div 8 AS STRING))"
)
_BLK_B = (
    f"concat(element_at(split({_PERTURB_NAME}, ' '), -1), '|',"
    f" CAST(({_PERTURB_SIZE}) div 8 AS STRING))"
)


def q_er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    blocks = part.selectExpr(
        f"{_BLK_A} AS blk_a", f"{_BLK_B} AS blk_b"
    ).persist()
    ca = blocks.groupBy(F.col("blk_a").alias("blk")).agg(
        F.count("*").alias("cnt_a")
    )
    cb = blocks.groupBy(F.col("blk_b").alias("blk")).agg(
        F.count("*").alias("cnt_b")
    )
    cand = (
        ca.join(cb, "blk")
        .agg(F.sum(F.expr("cnt_a * cnt_b")).cast("bigint").alias("n_cand"))
    )
    base = blocks.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(F.expr("IF(blk_a = blk_b, 1, 0)")).cast("bigint").alias("n_true_cand"),
    )
    out = base.crossJoin(cand).selectExpr(
        "n_records",
        "n_records * n_records AS n_total_pairs",
        "n_cand AS n_candidate_pairs",
        "n_records AS n_true_pairs",
        "n_true_cand AS n_true_in_candidates",
        "CAST(1000000 - n_cand * 1000000 div (n_records * n_records)"
        " AS BIGINT) AS reduction_ratio_micro",
        "CAST(n_true_cand * 1000000 div n_records AS BIGINT)"
        " AS pairs_completeness_micro",
        "CAST(n_true_cand * 1000000 div n_cand AS BIGINT)"
        " AS pairs_quality_micro",
    )
    blocks.unpersist(blocking=False)
    return out


SQL_ER_BLOCKING_QUALITY = f"""
WITH blocks AS (
    SELECT
        split_part(p_name, ' ', -1) || '|' ||
            CAST(p_size // 8 AS VARCHAR) AS blk_a,
        split_part(CASE WHEN p_partkey % 3 = 1
                        THEN substring(p_name, instr(p_name, ' ') + 1)
                        ELSE p_name END, ' ', -1) || '|' ||
            CAST((p_size + CASE WHEN p_partkey % 3 = 2 THEN 1 ELSE 0 END) // 8
                 AS VARCHAR) AS blk_b
    FROM part
),
ca AS (SELECT blk_a AS blk, count(*) AS cnt_a FROM blocks GROUP BY 1),
cb AS (SELECT blk_b AS blk, count(*) AS cnt_b FROM blocks GROUP BY 1),
cand AS (
    SELECT CAST(sum(cnt_a * cnt_b) AS BIGINT) AS n_cand
    FROM ca JOIN cb USING (blk)
),
base AS (
    SELECT CAST(count(*) AS BIGINT) AS n_records,
           CAST(count(*) FILTER (blk_a = blk_b) AS BIGINT) AS n_true_cand
    FROM blocks
)
SELECT n_records,
       n_records * n_records AS n_total_pairs,
       n_cand AS n_candidate_pairs,
       n_records AS n_true_pairs,
       n_true_cand AS n_true_in_candidates,
       CAST(1000000 - n_cand * 1000000 // (n_records * n_records) AS BIGINT)
           AS reduction_ratio_micro,
       CAST(n_true_cand * 1000000 // n_records AS BIGINT)
           AS pairs_completeness_micro,
       CAST(n_true_cand * 1000000 // n_cand AS BIGINT) AS pairs_quality_micro
FROM base, cand
"""


QUERIES = {
    "er_blocking_quality": (q_er_blocking_quality, SQL_ER_BLOCKING_QUALITY),
}
