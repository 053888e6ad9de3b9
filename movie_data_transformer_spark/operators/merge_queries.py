"""Registry entries for the stateful merge (SURVEY.md §7 M2, op 9).

State/batch are carved from the derived ratings by day-of-month parity
(portable string arithmetic on the date column), so the same (customer,
movie) keys genuinely collide across the two sides and the LWW resolution
is exercised, not just the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.fixtures import RATINGS_ORACLE_CTE
from movie_data_transformer_spark.operators.merge import merge_flat
from movie_data_transformer_spark.operators.movie_queries import _exploded

def _day_parity():
    # built lazily: Column construction needs an active SparkContext, and
    # the registry may be imported before the harness creates its session
    return F.substring("date", 9, 2).cast("int") % 2


def q_movies_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _exploded(spark, sf_dir)
    state = flat.filter(_day_parity() == 0)
    batch = flat.filter(_day_parity() == 1)
    return merge_flat(state, batch)


SQL_MOVIES_MERGE_UPSERT = f"""
WITH {RATINGS_ORACLE_CTE},
dedup AS (
    SELECT *, CAST(substr("date", 9, 2) AS INT) % 2 AS day_par FROM (
        SELECT r.*,
               row_number() OVER (
                   PARTITION BY customerId, movieId,
                                CAST(substr("date", 9, 2) AS INT) % 2
                   ORDER BY try_cast("date" AS DATE) DESC NULLS LAST,
                            rating DESC, "date" DESC
               ) AS _rn
        FROM ratings r
    ) WHERE _rn = 1
),
state AS (SELECT * FROM dedup WHERE day_par = 0),
batch AS (SELECT * FROM dedup WHERE day_par = 1)
SELECT
    CASE WHEN new_wins THEN b_movieId ELSE s_movieId END AS movieId,
    CASE WHEN new_wins THEN b_title ELSE s_title END AS title,
    CASE WHEN new_wins THEN b_year ELSE s_year END AS yearOfRelease,
    CASE WHEN new_wins THEN b_customerId ELSE s_customerId END AS customerId,
    CASE WHEN new_wins THEN b_rating ELSE s_rating END AS rating,
    CASE WHEN new_wins THEN b_date ELSE s_date END AS "date"
FROM (
    SELECT
        s.movieId AS s_movieId, s.title AS s_title, s.yearOfRelease AS s_year,
        s.customerId AS s_customerId, s.rating AS s_rating, s."date" AS s_date,
        b.movieId AS b_movieId, b.title AS b_title, b.yearOfRelease AS b_year,
        b.customerId AS b_customerId, b.rating AS b_rating, b."date" AS b_date,
        (s.customerId IS NULL) OR (
            try_cast(s."date" AS DATE) IS NOT NULL
            AND try_cast(b."date" AS DATE) IS NOT NULL
            AND try_cast(b."date" AS DATE) > try_cast(s."date" AS DATE)
        ) AS new_wins
    FROM state s
    FULL OUTER JOIN batch b
      ON s.customerId = b.customerId AND s.movieId = b.movieId
)
"""


QUERIES = {
    "movies_merge_upsert": (q_movies_merge_upsert, SQL_MOVIES_MERGE_UPSERT),
}
