"""Round-6 data-quality extension: Benford first-significant-digit
profiling of monetary amounts — the classic fabricated-data / broken-ETL
tripwire (organic multiplicative amounts follow log10(1 + 1/d); uniform
or truncated generators don't).

Everything is exact: digit extraction is string arithmetic on the exact
decimal cents (double -> DECIMAL(18,2) first — the decimal_sum money
convention — then *100, so no engine-dependent double->int cast runs), observed shares are floor-micro ratios, and the
Benford expectation enters as PRECOMPUTED integer micro literals
(floor(log10(1+1/d) * 1e6) — computed once here, not at query time, so
no log() ever runs in either engine; the NOTES.md log10 discipline).
The deviation column |obs - exp| in micro units gives the operational
signal without a chi-square (whose FP sum would break exactness).

Scale: one map-side digit projection + a 9-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — fixed constants of the
#: Benford distribution, shared verbatim by both engines.
BENFORD_MICRO = {
    1: 301029,
    2: 176091,
    3: 124938,
    4: 96910,
    5: 79181,
    6: 66946,
    7: 57991,
    8: 51152,
    9: 45757,
}

_CASE = "CASE " + " ".join(
    f"WHEN first_digit = {d} THEN {m}" for d, m in BENFORD_MICRO.items()
) + " END"


def q_orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_bf_orders")
    return spark.sql(
        f"""
        WITH digits AS (
            SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS STRING), 1, 1) AS INT) AS first_digit
            FROM _bf_orders WHERE o_totalprice > 0
        ),
        counts AS (
            SELECT first_digit, CAST(count(*) AS BIGINT) AS n_orders
            FROM digits GROUP BY first_digit
        )
        SELECT first_digit, n_orders,
               CAST(n_orders * 1000000 DIV (sum(n_orders) OVER ()) AS BIGINT)
                   AS obs_micro,
               CAST({_CASE} AS BIGINT) AS benford_micro,
               CAST(abs(n_orders * 1000000 DIV (sum(n_orders) OVER ())
                    - ({_CASE})) AS BIGINT) AS dev_micro
        FROM counts
        """
    )


SQL_ORDERS_BENFORD_DIGITS = f"""
WITH digits AS (
    SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS first_digit
    FROM orders WHERE o_totalprice > 0
),
counts AS (
    SELECT first_digit, CAST(count(*) AS BIGINT) AS n_orders
    FROM digits GROUP BY first_digit
)
SELECT first_digit, n_orders,
       CAST(n_orders * 1000000 // CAST(sum(n_orders) OVER () AS BIGINT)
            AS BIGINT) AS obs_micro,
       CAST({_CASE} AS BIGINT) AS benford_micro,
       CAST(abs(n_orders * 1000000 // CAST(sum(n_orders) OVER () AS BIGINT)
            - ({_CASE})) AS BIGINT) AS dev_micro
FROM counts
"""


QUERIES = {
    "orders_benford_digits": (q_orders_benford_digits, SQL_ORDERS_BENFORD_DIGITS),
}
