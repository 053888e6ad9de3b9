"""Dirty-input robustness surfaces: invalid-UTF8 repair and Spark 4
collations.

- text_fix_invalid_utf8: web-scrape corpora arrive with broken byte
  sequences; Spark 4's is_valid_utf8 / make_valid_utf8 are the engine's
  native validate-and-repair pass (each invalid byte becomes U+FFFD —
  pinned by probe: 2 planted bytes -> +2 chars). The fixture plants
  X'FFFE' on every 5th doc's encoded text, and the oracle recomputes
  every count and repaired length from the CLEAN columns alone, so the
  validity predicate, the replacement policy, and the binary plumbing
  are all hash-bound. Map-side only.

- group_collate_lcase: Spark 4 collation support — grouping a
  mixed-case column under UTF8_LCASE must equal grouping by lower().
  The collated group representative is arbitrary-case (first seen), so
  the entry projects lower(key) for a deterministic output — itself a
  documented behavior worth pinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

CORRUPT_MOD = 5  # every 5th doc gets two invalid trailing bytes


def q_text_fix_invalid_utf8(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.selectExpr(
        "source",
        f"CASE WHEN doc_id % {CORRUPT_MOD} = 0"
        "      THEN concat(encode(text, 'UTF-8'), X'FFFE')"
        "      ELSE encode(text, 'UTF-8') END AS b",
    )
    per_doc = blobs.selectExpr(
        "source",
        "CAST(NOT is_valid_utf8(b) AS INT) AS bad",
        "CAST(length(make_valid_utf8(b)) AS BIGINT) AS n_chars_fixed",
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("bad").cast("bigint").alias("n_invalid"),
        F.sum("n_chars_fixed").cast("bigint").alias("sum_chars_fixed"),
    )


SQL_TEXT_FIX_INVALID_UTF8 = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_invalid,
       CAST(sum(length(text)
                + CASE WHEN doc_id % {CORRUPT_MOD} = 0 THEN 2 ELSE 0 END) AS BIGINT)
           AS sum_chars_fixed
FROM documents GROUP BY source
"""


def q_group_collate_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via UTF8_LCASE collation over a
    synthesized mixed-case segment column; equals grouping by lower()."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_col_customer")
    return spark.sql(
        """
        SELECT lower(g) AS segment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS acctbal_cents
        FROM (
            SELECT IF(c_custkey % 2 = 0, upper(c_mktsegment),
                      lower(c_mktsegment)) COLLATE UTF8_LCASE AS g,
                   c_acctbal
            FROM _col_customer
        )
        GROUP BY g
        """
    )


SQL_GROUP_COLLATE_LCASE = """
SELECT lower(c_mktsegment) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer GROUP BY 1
"""


QUERIES = {
    "text_fix_invalid_utf8": (q_text_fix_invalid_utf8, SQL_TEXT_FIX_INVALID_UTF8),
    "group_collate_lcase": (q_group_collate_lcase, SQL_GROUP_COLLATE_LCASE),
}
