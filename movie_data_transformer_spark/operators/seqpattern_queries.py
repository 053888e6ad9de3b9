"""Sequence-pattern matching over per-entity event streams — the
MATCH_RECOGNIZE-shaped operator (SQL:2016 row-pattern recognition;
Spark has no MATCH_RECOGNIZE, so the repo's form is the classic
compile-the-session-to-a-string trick): order each user's events by
(ts, event_id), map event types to single characters
(signup→s, click→c, error→e, view→v, purchase→p), and count
NON-OVERLAPPING leftmost regex matches over the sequence string.

Patterns (the two ops teams actually run):
  funnel  `vc*p`  — a view leading to a purchase through any number of
                    clicks (the regex form of the funnel operator,
                    complementing events_funnel_conversion's
                    earliest-completion semantics);
  burst   `ee+`   — runs of >= 2 consecutive errors (reliability
                    screen; one run counts once, non-overlapping).

Entry `events_seq_regex_funnel` (FULL DuckDB oracle): per user —
  user_id, n_events, n_funnel_matches, n_error_bursts.
Both engines use greedy leftmost non-overlapping semantics (Java
`regexp_extract_all(_, _, 0)` == DuckDB `regexp_extract_all`), and the
sequence construction is a deterministic total order (ts, event_id).

Scale: ONE shuffle (groupBy user_id); the per-user sequence is bounded
by that user's activity (collect_list of 1-char tokens, kilobytes at
any realistic per-entity event count), and the regex scan is row-local.
The same shape at 100 TB: sessionized or per-user pattern counting is a
single keyed aggregate, never a join. A pathological mega-user is the
single-key skew case — at extreme scale, pre-split by (user_id, day)
and sum the per-day counts of the non-boundary-crossing patterns, or
cap with the dedup max_bucket_size pattern; fixture max is ~70
events/user so no cap binds here (and none is claimed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.sources.tables import load_table

FUNNEL_RE = "vc*p"
BURST_RE = "ee+"

#: event_type -> sequence char (first letter is unique across types)
_CHR = "substr(event_type, 1, 1)"


def q_events_seq_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "ts", "event_id", f"{_CHR} AS ch"
    )
    seqs = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, ch))),"
            " x -> x.ch), '')"
        ).alias("seq"),
    )
    return seqs.selectExpr(
        "user_id",
        "n_events",
        f"CAST(size(regexp_extract_all(seq, '{FUNNEL_RE}', 0)) AS BIGINT)"
        " AS n_funnel_matches",
        f"CAST(size(regexp_extract_all(seq, '{BURST_RE}', 0)) AS BIGINT)"
        " AS n_error_bursts",
    )


SQL_EVENTS_SEQ_REGEX_FUNNEL = f"""
WITH seqs AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       n_events,
       CAST(len(regexp_extract_all(seq, '{FUNNEL_RE}')) AS BIGINT)
           AS n_funnel_matches,
       CAST(len(regexp_extract_all(seq, '{BURST_RE}')) AS BIGINT)
           AS n_error_bursts
FROM seqs
"""


QUERIES = {
    "events_seq_regex_funnel": (
        q_events_seq_regex_funnel,
        SQL_EVENTS_SEQ_REGEX_FUNNEL,
    ),
}
