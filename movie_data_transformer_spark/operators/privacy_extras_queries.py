"""Round-6 privacy extension: k-anonymity / l-diversity auditing — the
release-gate report a dataset must pass before quasi-identifiable rows
ship (Sweeney k-anonymity; Machanavajjhala l-diversity). Field-level
crypto and redaction are already covered (pii_aes_roundtrip,
text_pii_redact); this is the COMPLEMENTARY structural audit: group the
corpus by its quasi-identifier tuple (lang x coarse length band — the
kind of combination that re-identifies), report each class's size k and
its l (distinct sensitive values, here `source`), and flag classes
below the k=5 / l=2 release thresholds.

All exact integers / counts -> FULL oracle. One shuffle to the
quasi-class grain; at 100 TB this is an ordinary aggregation whose
flagged classes drive suppression/generalization upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

K_MIN = 5
L_MIN = 2


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_ka_docs")
    return spark.sql(
        f"""
        WITH classes AS (
            SELECT lang, n_chars DIV 200 AS len_band,
                   count(*) AS k,
                   count(DISTINCT source) AS l
            FROM _ka_docs
            GROUP BY lang, n_chars DIV 200
        )
        SELECT lang, CAST(len_band AS BIGINT) AS len_band,
               CAST(k AS BIGINT) AS k,
               CAST(l AS BIGINT) AS l,
               CAST(CASE WHEN k < {K_MIN} THEN 1 ELSE 0 END AS INT)
                   AS below_k,
               CAST(CASE WHEN l < {L_MIN} THEN 1 ELSE 0 END AS INT)
                   AS below_l
        FROM classes
        """
    )


SQL_PRIVACY_K_ANONYMITY = f"""
WITH classes AS (
    SELECT lang, n_chars // 200 AS len_band,
           count(*) AS k,
           count(DISTINCT source) AS l
    FROM documents
    GROUP BY lang, n_chars // 200
)
SELECT lang, CAST(len_band AS BIGINT) AS len_band,
       CAST(k AS BIGINT) AS k,
       CAST(l AS BIGINT) AS l,
       CAST(CASE WHEN k < {K_MIN} THEN 1 ELSE 0 END AS INT) AS below_k,
       CAST(CASE WHEN l < {L_MIN} THEN 1 ELSE 0 END AS INT) AS below_l
FROM classes
"""


QUERIES = {
    "privacy_k_anonymity": (q_privacy_k_anonymity, SQL_PRIVACY_K_ANONYMITY),
}
