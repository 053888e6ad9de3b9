"""PII scrubbing, the corpus-scale RECALL audit — complements
llm_queries.text_pii_redact, which pins the redaction/count semantics on
a handful of literal planted rows: this entry plants PII by FORMULA
across the whole corpus (every doc_id %5 / %7, so the planted set scales
with the data), binds the redacted TEXT itself per document (md5 — a
redactor that counts right but leaks the address breaks the hash, which
counts alone cannot catch), and carries a zero-leak pytest gate that
re-scans the redacted output for any surviving match.

Planted truth: deterministic contact lines are appended to a known doc
subset (doc_id % 5 == 0 gets an email, % 7 == 0 a phone; %35 gets both)
— the repo's planted-copy pattern — so recall is exact and the oracle
re-derives every redaction from the plant formula. Detection runs on
the AUGMENTED text via regex (character classes + bounded quantifiers
only, semantics identical across Java regex and RE2/DuckDB), and the
output binds the redacted text itself (md5), not just the counts: a
redactor that counts right but leaks the address breaks the hash.

Scale: pure map-side — regexp_extract_all + regexp_replace are JVM
expressions inside whole-stage codegen; no shuffle at all before the
final projection. This is the shape PII scrubbing MUST have at 100 TB
(one pass, no state); entity types needing context (names) slot in as
an Arrow-batched UDF under the same projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+"
_PHONE_RE = "[+]1-555-[0-9]{4}"


def q_pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    augmented = docs.selectExpr(
        "doc_id",
        "concat(text,"
        " CASE WHEN doc_id % 5 = 0 THEN concat(' contact user', doc_id,"
        "      '@example.com') ELSE '' END,"
        " CASE WHEN doc_id % 7 = 0 THEN concat(' call +1-555-',"
        "      lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END"
        ") AS text",
    )
    return augmented.selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS BIGINT)"
        " AS n_emails",
        f"CAST(size(regexp_extract_all(text, '{_PHONE_RE}', 0)) AS BIGINT)"
        " AS n_phones",
        f"md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]'),"
        f" '{_PHONE_RE}', '[PHONE]')) AS redacted_md5",
    ).filter("n_emails > 0 OR n_phones > 0")


SQL_PII_DETECT_REDACT = f"""
WITH augmented AS (
    SELECT doc_id,
           text ||
           CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || doc_id || '@example.com'
                ELSE '' END ||
           CASE WHEN doc_id % 7 = 0
                THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
FROM augmented
WHERE len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
   OR len(regexp_extract_all(text, '{_PHONE_RE}')) > 0
"""


QUERIES = {
    "pii_detect_redact": (q_pii_detect_redact, SQL_PII_DETECT_REDACT),
}
