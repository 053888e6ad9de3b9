"""Fellegi–Sunter probabilistic record linkage — the classic (1969)
match/possible/non-match scoring model behind every production entity-
resolution system (Splink, JedAI, dedupe.io). Completes the repo's ER
family: fuzzy_name_match finds candidate pairs, dedup_sorted_neighborhood
blocks them — this entry SCORES them with field-agreement log-odds
weights and classifies against thresholds, with the planted ground
truth riding in the output so precision is a red/green driver fact.

Dirty-duplicates fixture (planted truth, both engines derive it): each
part row yields a clean record in "system A" and a perturbed twin in
"system B" (p_partkey % 3 == 1 drops the first name word; % 3 == 2
bumps p_size by 1; % 3 == 0 stays identical). Candidate pairs are
blocked on the name's final noun (the fuzzy_name_match block key).
Blocking is multi-field — (final noun, size div 8 band) — because part
names repeat heavily (few adjective x noun combos), so noun-only blocks
pair ROWS quadratically; the size band bounds block width. The %3==2
size bump crosses a band boundary only at multiples of 8 — those true
pairs are blocked out deterministically, the textbook blocking-recall
cost, visible in the confusion output rather than hidden.
Agreement vector per pair: exact-name, levenshtein <= 4, brand, size.
Score = sum of FIXED integer milli-log-odds weights (the literature's
m/u form ln(m/u) and ln((1-m)/(1-u)), precomputed as literal constants
— the Benford-constants discipline); classes by fixed thresholds.

Output grain: per (class, is_true_match) — the confusion-matrix rows of
the linkage run, oracle-exact.

Scale: blocking bounds the pair space exactly as fuzzy_name_match does
(|distinct labels|^2 within block, never |rows|^2); scoring is row-local
arithmetic; the confusion agg is 6 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

# milli-log-odds agreement/disagreement weights per field (fixed
# constants in the Fellegi-Sunter ln(m/u) / ln((1-m)/(1-u)) form)
W_NAME_EXACT = (4_000, -1_500)
W_NAME_FUZZY = (2_500, -2_000)
W_BRAND = (1_200, -800)
W_SIZE = (1_000, -700)
T_MATCH = 6_000
T_POSSIBLE = 1_000

_PERTURB_NAME = (
    "CASE WHEN p_partkey % 3 = 1"
    " THEN substring(p_name, instr(p_name, ' ') + 1) ELSE p_name END"
)
_PERTURB_SIZE = "p_size + CASE WHEN p_partkey % 3 = 2 THEN 1 ELSE 0 END"


def q_er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    a = part.selectExpr(
        "p_partkey AS key_a",
        "p_name AS name_a",
        "p_brand AS brand_a",
        "p_size AS size_a",
        "concat(element_at(split(p_name, ' '), -1), '|',"
        " CAST(p_size div 8 AS STRING)) AS blk",
    )
    b = part.selectExpr(
        "p_partkey AS key_b",
        f"{_PERTURB_NAME} AS name_b",
        "p_brand AS brand_b",
        f"{_PERTURB_SIZE} AS size_b",
        "concat(element_at(split(p_name, ' '), -1), '|',"
        f" CAST(({_PERTURB_SIZE}) div 8 AS STRING)) AS blk",
    )
    # the name-weight table runs on DISTINCT label pairs (|labels|^2
    # within noun, ~9k DP calls), not the 5.7M record pairs — the
    # fuzzy_name_match discipline; record pairs then broadcast-look-up
    # their name weight (names repeat heavily, so this is the whole
    # levenshtein cost collapsed ~600x)
    la = a.selectExpr(
        "name_a", "element_at(split(name_a, ' '), -1) AS noun_l"
    ).distinct()
    lb = b.selectExpr(
        "name_b", "element_at(split(name_b, ' '), -1) AS noun_l"
    ).distinct()
    lev_tab = la.join(F.broadcast(lb), "noun_l").selectExpr(
        "name_a",
        "name_b",
        f"CASE WHEN name_a = name_b THEN {W_NAME_EXACT[0] + W_NAME_FUZZY[0]}"
        f" WHEN levenshtein(name_a, name_b) <= 4"
        f" THEN {W_NAME_EXACT[1] + W_NAME_FUZZY[0]}"
        f" ELSE {W_NAME_EXACT[1] + W_NAME_FUZZY[1]} END AS name_w",
    )
    scored = (
        a.join(b, "blk")
        .join(F.broadcast(lev_tab), ["name_a", "name_b"])
        .selectExpr(
            "key_a",
            "key_b",
            f"name_w"
            f" + CASE WHEN brand_a = brand_b THEN {W_BRAND[0]}"
            f" ELSE {W_BRAND[1]} END"
            f" + CASE WHEN size_a = size_b THEN {W_SIZE[0]}"
            f" ELSE {W_SIZE[1]} END AS score_milli",
        )
        .selectExpr(
            "key_a",
            "key_b",
            "score_milli",
            f"CASE WHEN score_milli >= {T_MATCH} THEN 'match'"
            f" WHEN score_milli >= {T_POSSIBLE} THEN 'possible'"
            " ELSE 'non_match' END AS class",
            "CAST(key_a = key_b AS BOOLEAN) AS is_true_match",
        )
    )
    return scored.groupBy("class", "is_true_match").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("score_milli").cast("long").alias("min_score_milli"),
        F.max("score_milli").cast("long").alias("max_score_milli"),
    )


SQL_ER_FELLEGI_SUNTER = f"""
WITH a AS (
    SELECT p_partkey AS key_a, p_name AS name_a, p_brand AS brand_a,
           p_size AS size_a,
           string_split(p_name, ' ')[-1] || '|' ||
               CAST(p_size // 8 AS VARCHAR) AS blk
    FROM part
),
b AS (
    SELECT p_partkey AS key_b,
           CASE WHEN p_partkey % 3 = 1
                THEN substring(p_name, instr(p_name, ' ') + 1)
                ELSE p_name END AS name_b,
           p_brand AS brand_b,
           p_size + CASE WHEN p_partkey % 3 = 2 THEN 1 ELSE 0 END AS size_b,
           string_split(p_name, ' ')[-1] || '|' ||
               CAST((p_size + CASE WHEN p_partkey % 3 = 2 THEN 1 ELSE 0 END)
                    // 8 AS VARCHAR) AS blk
    FROM part
),
lev_tab AS (
    SELECT la.name_a, lb.name_b,
           CASE WHEN la.name_a = lb.name_b
                THEN {W_NAME_EXACT[0] + W_NAME_FUZZY[0]}
                WHEN levenshtein(la.name_a, lb.name_b) <= 4
                THEN {W_NAME_EXACT[1] + W_NAME_FUZZY[0]}
                ELSE {W_NAME_EXACT[1] + W_NAME_FUZZY[1]} END AS name_w
    FROM (SELECT DISTINCT name_a,
                 string_split(name_a, ' ')[-1] AS noun_l FROM a) la
    JOIN (SELECT DISTINCT name_b,
                 string_split(name_b, ' ')[-1] AS noun_l FROM b) lb
      USING (noun_l)
),
scored AS (
    SELECT key_a, key_b,
           name_w
           + CASE WHEN brand_a = brand_b THEN {W_BRAND[0]}
                  ELSE {W_BRAND[1]} END
           + CASE WHEN size_a = size_b THEN {W_SIZE[0]}
                  ELSE {W_SIZE[1]} END AS score_milli
    FROM a JOIN b USING (blk)
    JOIN lev_tab USING (name_a, name_b)
)
SELECT CASE WHEN score_milli >= {T_MATCH} THEN 'match'
            WHEN score_milli >= {T_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS class,
       CAST(key_a = key_b AS BOOLEAN) AS is_true_match,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(score_milli) AS BIGINT) AS min_score_milli,
       CAST(max(score_milli) AS BIGINT) AS max_score_milli
FROM scored
GROUP BY 1, 2
"""


QUERIES = {
    "er_fellegi_sunter": (q_er_fellegi_sunter, SQL_ER_FELLEGI_SUNTER),
}
