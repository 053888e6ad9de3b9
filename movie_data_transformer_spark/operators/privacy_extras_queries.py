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


ERASE_MOD = 37  # deterministic synthetic deletion-request list


def q_privacy_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten execution audit: given a deletion-request
    list (users with user_id % 37 == 0 — a deterministic stand-in for
    the DSR queue), apply the erasure to the events feed via an
    anti-join and emit the compliance accounting every DPO report
    needs: rows before/after, rows erased, distinct subjects erased vs
    requested, RESIDUAL references after erasure (must be 0 — the gate
    column), and the conservation identity before = after + erased.

    The requests table also carries never-seen subjects (requested ids
    not present in the feed) — the audit separates "erased" from
    "nothing to erase", which real DSR tooling must distinguish.

    Scale: one broadcast anti-join (the request list is tiny relative
    to the feed) + conditional aggregates in one pass each over feed
    and survivor sets; nothing driver-side. At 100 TB the erasure is
    the same anti-join feeding a partition rewrite (merge_into /
    snapshot store), and this report reads the rewritten table."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_er_events")
    return spark.sql(
        f"""
        WITH requests AS (
            SELECT DISTINCT user_id FROM _er_events
            WHERE user_id % {ERASE_MOD} = 0
            UNION
            SELECT 999999999 AS user_id  -- a never-seen subject
        ),
        survivors AS (
            SELECT e.* FROM _er_events e
            LEFT ANTI JOIN requests r ON e.user_id = r.user_id
        ),
        feed AS (
            SELECT CAST(count(*) AS BIGINT) AS rows_before,
                   CAST(count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                        THEN user_id END) AS BIGINT) AS subjects_in_feed
            FROM _er_events
        ),
        after AS (
            SELECT CAST(count(*) AS BIGINT) AS rows_after,
                   CAST(count(CASE WHEN user_id % {ERASE_MOD} = 0
                        THEN 1 END) AS BIGINT) AS residual_refs
            FROM survivors
        ),
        req AS (
            SELECT CAST(count(*) AS BIGINT) AS subjects_requested
            FROM requests
        )
        SELECT f.rows_before, a.rows_after,
               f.rows_before - a.rows_after AS rows_erased,
               r.subjects_requested, f.subjects_in_feed,
               r.subjects_requested - f.subjects_in_feed
                   AS subjects_nothing_to_erase,
               a.residual_refs,
               CAST(CASE WHEN a.residual_refs = 0 THEN 1 ELSE 0 END AS INT)
                   AS erasure_complete
        FROM feed f CROSS JOIN after a CROSS JOIN req r
        """
    )


SQL_PRIVACY_ERASURE_AUDIT = f"""
WITH requests AS (
    SELECT DISTINCT user_id FROM events WHERE user_id % {ERASE_MOD} = 0
    UNION
    SELECT 999999999 AS user_id
),
survivors AS (
    SELECT e.* FROM events e
    ANTI JOIN requests r ON e.user_id = r.user_id
),
feed AS (
    SELECT CAST(count(*) AS BIGINT) AS rows_before,
           CAST(count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                THEN user_id END) AS BIGINT) AS subjects_in_feed
    FROM events
),
after AS (
    SELECT CAST(count(*) AS BIGINT) AS rows_after,
           CAST(count(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 END)
               AS BIGINT) AS residual_refs
    FROM survivors
),
req AS (SELECT CAST(count(*) AS BIGINT) AS subjects_requested FROM requests)
SELECT f.rows_before, a.rows_after,
       f.rows_before - a.rows_after AS rows_erased,
       r.subjects_requested, f.subjects_in_feed,
       r.subjects_requested - f.subjects_in_feed
           AS subjects_nothing_to_erase,
       a.residual_refs,
       CAST(CASE WHEN a.residual_refs = 0 THEN 1 ELSE 0 END AS INT)
           AS erasure_complete
FROM feed f CROSS JOIN after a CROSS JOIN req r
"""


QUERIES["privacy_erasure_audit"] = (
    q_privacy_erasure_audit,
    SQL_PRIVACY_ERASURE_AUDIT,
)
