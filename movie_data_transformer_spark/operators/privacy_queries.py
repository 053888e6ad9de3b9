"""Privacy operations: field-level encryption for PII columns.

text_pii_redact handles detect-and-mask; this entry covers the other
compliance posture — REVERSIBLE protection, where a PII column is
encrypted at rest with aes_encrypt and only key holders can read it
back. The registry entry runs the full distributed round trip
(derive a synthetic email per event, encrypt, decrypt, verify) and is
held to a plaintext-only oracle: every output number (row counts,
round-trip successes, total ciphertext bytes via the PKCS7 padding
formula, ciphertext != plaintext everywhere) is recomputable from the
source columns, so a mode slip, a key mix-up, or a padding change
breaks the value hash.

Determinism: GCM (the aes_encrypt default) uses a random IV, so ONLY
the ECB form is hash-stable — fine for a correctness-of-the-surface
entry; SCALE.md notes that real deployments want GCM + per-row IVs
stored alongside (semantic security over determinism), and at 100 TB
the whole pass stays map-side (JVM codegen crypto, no UDFs, no
shuffle before the final small aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

_KEY = "0123456789abcdef"  # 128-bit demo key (a secret manager in prod)


def q_pii_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    enc = ev.selectExpr(
        "event_type",
        "concat('user_', user_id, '@example.com') AS email",
        f"aes_encrypt(concat('user_', user_id, '@example.com'), '{_KEY}', 'ECB') AS c",
    ).selectExpr(
        "event_type",
        "email",
        "c",
        f"CAST(aes_decrypt(c, '{_KEY}', 'ECB') AS STRING) AS back",
    )
    per_row = enc.selectExpr(
        "event_type",
        "CAST(back = email AS INT) AS ok",
        "CAST(length(c) AS BIGINT) AS cipher_bytes",
        "CAST(c != CAST(email AS BINARY) AS INT) AS differs",
    )
    return per_row.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("ok").cast("bigint").alias("n_roundtrip_ok"),
        F.sum("cipher_bytes").cast("bigint").alias("total_cipher_bytes"),
        F.sum("differs").cast("bigint").alias("n_cipher_differs"),
    )


SQL_PII_AES_ROUNDTRIP = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(ok) AS BIGINT) AS n_roundtrip_ok,
       CAST(sum(cipher_bytes) AS BIGINT) AS total_cipher_bytes,
       CAST(sum(differs) AS BIGINT) AS n_cipher_differs
FROM (
    SELECT event_type, 1 AS ok,
           16 * (length(concat('user_', user_id, '@example.com')) // 16 + 1)
               AS cipher_bytes,
           1 AS differs
    FROM events
)
GROUP BY event_type
"""


QUERIES = {
    "pii_aes_roundtrip": (q_pii_aes_roundtrip, SQL_PII_AES_ROUNDTRIP),
}
