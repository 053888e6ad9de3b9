"""Round-6 dedup extensions, registered behind the committed r07/r08
driver windows (NOTES.md ledger): containment-based near-dup detection —
the asymmetric score family the Jaccard/MinHash/SimHash battery lacked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.dedup import (
    CORPUS_ORACLE_CTE,
    augmented_corpus,
    containment_pairs,
    exact_substr_runs,
    ppjoin_prefix_pairs,
)
from movie_data_transformer_spark.sources.tables import load_table

MAX_SHINGLE_DF = 100
THRESHOLD = 0.5
RUN_WINDOW = 15


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs over the planted-dup corpus: the 's'-word-
    stripped near-copies are length-asymmetric by construction, exactly
    the shape containment exists for (see containment_pairs)."""
    return containment_pairs(
        augmented_corpus(load_table(spark, sf_dir, "documents")),
        n=2,
        threshold=THRESHOLD,
        max_shingle_df=MAX_SHINGLE_DF,
    )


# mirrors containment_pairs exactly: bigram shingles with the short-doc
# convention (concat_ws skips the NULL pad), per-lang df cap before the
# self-join, UNFILTERED set sizes in the denominator.
SQL_DEDUP_CONTAINMENT = f"""
WITH {CORPUS_ORACLE_CTE},
toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM corpus),
idx AS (SELECT doc_id, lang, t,
               unnest(range(1, greatest(len(t) - 1, 1) + 1)) AS i FROM toks),
sh AS (SELECT DISTINCT doc_id, lang,
              concat_ws(' ', t[i], t[i+1]) AS shingle FROM idx),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (
    SELECT lang, shingle FROM sh
    GROUP BY lang, shingle HAVING count(*) <= {MAX_SHINGLE_DF}
),
kept AS (SELECT sh.* FROM sh JOIN rare USING (lang, shingle)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM kept a JOIN kept b
      ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter * 1000000 // least(na.n_sh, nb.n_sh) AS DOUBLE)
           / 1000000 AS containment
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(n_inter * 1000000 // least(na.n_sh, nb.n_sh) AS DOUBLE)
          / 1000000 >= {THRESHOLD}
"""


def q_dedup_exact_substr_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest shared token run per linked pair over the planted-dup
    corpus (exact copies share their full length; near-copies share
    their longest untouched stretch). See dedup.exact_substr_runs."""
    return exact_substr_runs(
        augmented_corpus(load_table(spark, sf_dir, "documents")), window=RUN_WINDOW
    )


SQL_DEDUP_EXACT_SUBSTR_RUNS = f"""
WITH {CORPUS_ORACLE_CTE},
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
w0 AS (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - {RUN_WINDOW - 1})) AS pos
    FROM t WHERE len(toks) >= {RUN_WINDOW}
),
wins AS (
    SELECT doc_id, pos,
           md5(array_to_string(toks[pos:pos+{RUN_WINDOW - 1}], ' ')) AS wh
    FROM w0
),
rare AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) <= 100),
kept AS (SELECT wins.* FROM wins JOIN rare USING (wh)),
matches AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.pos AS pos_a, b.pos AS pos_b
    FROM kept a JOIN kept b ON a.wh = b.wh AND a.doc_id < b.doc_id
),
streaks AS (
    SELECT doc_a, doc_b,
           count(*) AS streak
    FROM (
        SELECT doc_a, doc_b, pos_a - pos_b AS diag,
               pos_a - row_number() OVER (PARTITION BY doc_a, doc_b,
                   pos_a - pos_b ORDER BY pos_a) AS island
        FROM matches
    )
    GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b,
       CAST({RUN_WINDOW} + max(streak) - 1 AS BIGINT) AS max_run_tokens
FROM streaks
GROUP BY doc_a, doc_b
"""


def q_dedup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph SHAPE observability: the degree histogram of the
    MinHash pair graph — (degree, n_docs) for every doc appearing in at
    least one pair. The operational pre-clustering question at 100 TB:
    a fat tail here means mega-clusters (route to exact dedup / raise
    the bucket cap guard) before paying for connected components.
    Composes the production pair generator; the oracle composes the
    same pair SQL, so the histogram binds the whole pair pipeline."""
    from movie_data_transformer_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        augmented_corpus(load_table(spark, sf_dir, "documents")),
        n=3,
        threshold=0.3,
        max_bucket_size=10_000,
    )
    deg = (
        pairs.selectExpr("doc_a AS doc_id")
        .unionAll(pairs.selectExpr("doc_b AS doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


def _degree_histogram_sql() -> str:
    from movie_data_transformer_spark.operators.llm_queries import _minhash_ctes

    return f"""
WITH {_minhash_ctes()},
deg AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL
        SELECT doc_b FROM pairs
    ) GROUP BY doc_id
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree
"""


def q_dedup_ppjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering (PPJoin) set-similarity join over the planted-dup
    corpus at Jaccard >= 0.5. The Spark side explodes ONLY each doc's
    df-ascending prefix into the candidate join; the oracle is the
    un-filtered all-pairs inverted-list join — equality IS the proof the
    prefix filter is lossless (see dedup.ppjoin_prefix_pairs)."""
    return ppjoin_prefix_pairs(
        augmented_corpus(load_table(spark, sf_dir, "documents")),
        n=2,
        threshold_num=1,
        threshold_den=2,
        max_shingle_df=MAX_SHINGLE_DF,
    )


# The oracle deliberately does NOT prefix-filter: it joins the full kept
# shingle sets all-pairs (within lang, df-capped, exact Jaccard over the
# KEPT sets — sizes after the cap, unlike the containment oracle's raw
# sizes). Result-set equality with the Spark side binds the completeness
# of the prefix candidate generation.
SQL_DEDUP_PPJOIN_PREFIX = f"""
WITH {CORPUS_ORACLE_CTE},
toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM corpus),
idx AS (SELECT doc_id, lang, t,
               unnest(range(1, greatest(len(t) - 1, 1) + 1)) AS i FROM toks),
sh AS (SELECT DISTINCT doc_id, lang,
              concat_ws(' ', t[i], t[i+1]) AS shingle FROM idx),
dfs AS (SELECT lang, shingle, count(*) AS df
        FROM sh GROUP BY lang, shingle),
kept AS (SELECT sh.* FROM sh JOIN dfs USING (lang, shingle)
         WHERE dfs.df <= {MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, count(*) AS m FROM kept GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM kept a JOIN kept b
      ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter * 1000000 // (na.m + nb.m - n_inter) AS DOUBLE)
           / 1000000 AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(n_inter * 1000000 // (na.m + nb.m - n_inter) AS DOUBLE)
          / 1000000 >= 0.5
"""


QUERIES = {
    "dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "dedup_ppjoin_prefix": (q_dedup_ppjoin_prefix, SQL_DEDUP_PPJOIN_PREFIX),
    "dedup_exact_substr_runs": (
        q_dedup_exact_substr_runs,
        SQL_DEDUP_EXACT_SUBSTR_RUNS,
    ),
    "dedup_degree_histogram": (q_dedup_degree_histogram, _degree_histogram_sql()),
}
