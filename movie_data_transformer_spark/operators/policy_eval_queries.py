"""Offline policy evaluation from logged interactions — IPS and SNIPS
(Horvitz–Thompson inverse-propensity scoring; Swaminathan & Joachims
2015 for the self-normalized form): before a new recommendation/serving
policy ships, replay the interaction log and estimate what reward the
NEW policy would have collected, correcting for the logging policy's
action distribution. The counterfactual-eval step of every bandit /
recsys loop, downstream of pref_pairs_build and recsys_pipeline_e2e.

Setup (documented assumption, pinned in pytest): the logging policy is
UNIFORM over the 5 event_types (the fixture's generator is uniform), so
every logged action has propensity 1/5 and the IPS weight is the
constant 5. Two deterministic candidate policies are evaluated:
  by_mod:  pi(user) = action indexed by user_id % 5 over the sorted
           action vocabulary
  always_purchase: pi(user) = 'purchase'
Rewards are `value` in exact integer cents.

    IPS   = (1/n) * sum_i 1[a_i = pi(x_i)] * 5 * r_i      (cents DIV n)
    SNIPS = sum_matched r_i / n_matched                    (cents DIV)

Entry `policy_ips_offline_eval` (FULL DuckDB oracle): per policy —
n_logged, n_matched, ips_value_cents, snips_value_cents. IPS and SNIPS
disagree exactly when the match rate differs from 1/5 — the estimator
variance story, visible in the output.

Scale: one events scan, the 2-row policy spine broadcast-exploded
map-side, one 2-row aggregate — scan-bound; no data-sized joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

#: sorted action vocabulary — index base for the by_mod policy
ACTIONS = ("click", "error", "purchase", "signup", "view")
N_ACTIONS = len(ACTIONS)

_ACTIONS_ARRAY_SPARK = "array(" + ", ".join(f"'{a}'" for a in ACTIONS) + ")"
_ACTIONS_ARRAY_DUCK = "[" + ", ".join(f"'{a}'" for a in ACTIONS) + "]"


def q_policy_ips_offline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    )
    scored = ev.selectExpr(
        "event_type",
        "cents",
        f"element_at({_ACTIONS_ARRAY_SPARK},"
        f" CAST(user_id % {N_ACTIONS} AS INT) + 1) AS pi_by_mod",
    ).selectExpr(
        "explode(array("
        "  named_struct('policy', 'by_mod',"
        "   'matched', CAST(event_type = pi_by_mod AS INT), 'cents', cents),"
        "  named_struct('policy', 'always_purchase',"
        "   'matched', CAST(event_type = 'purchase' AS INT), 'cents', cents)"
        ")) AS s"
    ).selectExpr("s.policy AS policy", "s.matched AS matched", "s.cents AS cents")
    return (
        scored.groupBy("policy")
        .agg(
            F.count("*").cast("bigint").alias("n_logged"),
            F.sum("matched").cast("bigint").alias("n_matched"),
            F.sum(F.expr("matched * cents")).cast("bigint").alias("_mr"),
        )
        .selectExpr(
            "policy",
            "n_logged",
            "n_matched",
            f"CAST(_mr * {N_ACTIONS} DIV n_logged AS BIGINT)"
            " AS ips_value_cents",
            "CASE WHEN n_matched = 0 THEN 0L ELSE"
            " CAST(_mr DIV n_matched AS BIGINT) END AS snips_value_cents",
        )
    )


SQL_POLICY_IPS_OFFLINE_EVAL = f"""
WITH logged AS (
    SELECT user_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           ({_ACTIONS_ARRAY_DUCK})[CAST(user_id % {N_ACTIONS} AS INT) + 1]
               AS pi_by_mod
    FROM events
),
scored AS (
    SELECT 'by_mod' AS policy,
           CAST(event_type = pi_by_mod AS INT) AS matched, cents
    FROM logged
    UNION ALL
    SELECT 'always_purchase' AS policy,
           CAST(event_type = 'purchase' AS INT) AS matched, cents
    FROM logged
)
SELECT policy,
       CAST(count(*) AS BIGINT) AS n_logged,
       CAST(sum(matched) AS BIGINT) AS n_matched,
       CAST(sum(matched * cents) * {N_ACTIONS} // count(*) AS BIGINT)
           AS ips_value_cents,
       CASE WHEN sum(matched) = 0 THEN CAST(0 AS BIGINT) ELSE
            CAST(sum(matched * cents) // sum(matched) AS BIGINT)
       END AS snips_value_cents
FROM scored
GROUP BY policy
"""


QUERIES = {
    "policy_ips_offline_eval": (
        q_policy_ips_offline_eval,
        SQL_POLICY_IPS_OFFLINE_EVAL,
    ),
}
