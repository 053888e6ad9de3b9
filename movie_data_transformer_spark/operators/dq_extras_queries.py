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
from pyspark.sql import functions as F

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


def q_source_token_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between the unigram token
    distributions of every source pair — the corpus-drift monitor a
    curation pipeline runs when a new crawl snapshot lands ("did src7's
    content distribution move?"). TV = 0.5 * sum_t |p_a(t) - p_b(t)|,
    EXACT: with counts c and totals N the numerator is
    sum_t |c_a*N_b - c_b*N_a| over the token UNION, and the union
    decomposes so only the INNER join is ever computed:

        sum_{a-only} c_a*N_b  =  N_a*N_b - sum_{shared} c_a*N_b

    (sum of c_a over ALL of a's tokens is N_a). So: one (source, token)
    count table, one token-keyed self-join over SHARED tokens, and the
    190-row pair spine (totals x totals, broadcast) supplies the
    completion terms — pairs sharing nothing fall out as TV = 1.
    Partials in DECIMAL(38,0)/HUGEINT (c*N clears int64 at ~3e9 tokens
    per source); one remainder-subtract micro floor at the end.

    Scale: the count table is vocab-sized per source (not corpus-sized);
    the self-join is bounded by sum_t df(t)^2 over sources — with S
    sources at most S^2 * |vocab|, independent of corpus row count."""
    from movie_data_transformer_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    # Spark SQL CTEs are INLINED per consumer: `counts` feeds six
    # subtree references (both shared sides, both total joins, both
    # spine sides), which would re-tokenize the corpus six times in the
    # static plan — materialize the vocab-sized count table once.
    counts = (
        docs.select(
            "source",
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
        .persist()
    )
    counts.createOrReplaceTempView("_tv_counts")
    return spark.sql(
        """
        WITH counts AS (SELECT * FROM _tv_counts),
        totals AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
        ),
        spine AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   a.n AS n_a, b.n AS n_b
            FROM totals a JOIN totals b ON a.source < b.source
        ),
        shared AS (
            -- DECIMAL(38,0) partials: c*N and N_a*N_b clear int64 once a
            -- source holds ~3e9 tokens — inside the 100 TB domain
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(sum(abs(CAST(a.c AS DECIMAL(19,0)) * tb.n
                       - CAST(b.c AS DECIMAL(19,0)) * ta.n))
                       AS DECIMAL(38,0)) AS s_abs,
                   CAST(sum(CAST(a.c AS DECIMAL(19,0)) * tb.n)
                       AS DECIMAL(38,0)) AS s_a,
                   CAST(sum(CAST(b.c AS DECIMAL(19,0)) * ta.n)
                       AS DECIMAL(38,0)) AS s_b
            FROM counts a
            JOIN counts b ON a.tok = b.tok AND a.source < b.source
            JOIN totals ta ON ta.source = a.source
            JOIN totals tb ON tb.source = b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b,
               CAST(CAST((m - (m % d)) / d AS BIGINT) AS DOUBLE) / 1000000
                   AS tv_distance
        FROM (
            SELECT s.src_a, s.src_b,
                   (coalesce(sh.s_abs, 0)
                    + (CAST(s.n_a AS DECIMAL(19,0)) * s.n_b
                       - coalesce(sh.s_a, 0))
                    + (CAST(s.n_a AS DECIMAL(19,0)) * s.n_b
                       - coalesce(sh.s_b, 0))) * 1000000 AS m,
                   CAST(2 AS DECIMAL(19,0)) * s.n_a * s.n_b AS d
            FROM spine s
            LEFT JOIN shared sh ON sh.src_a = s.src_a AND sh.src_b = s.src_b
        )
        """
    )


SQL_SOURCE_TOKEN_TV_DRIFT = """
WITH corpus AS (
    SELECT source,
           lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS text
    FROM documents
),
toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM corpus
),
counts AS (
    SELECT source, tok, CAST(count(*) AS BIGINT) AS c
    FROM toks GROUP BY 1, 2
),
totals AS (
    SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
),
spine AS (
    SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b
    FROM totals a JOIN totals b ON a.source < b.source
),
shared AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(sum(abs(CAST(a.c AS HUGEINT) * tb.n
               - CAST(b.c AS HUGEINT) * ta.n)) AS HUGEINT) AS s_abs,
           CAST(sum(CAST(a.c AS HUGEINT) * tb.n) AS HUGEINT) AS s_a,
           CAST(sum(CAST(b.c AS HUGEINT) * ta.n) AS HUGEINT) AS s_b
    FROM counts a
    JOIN counts b ON a.tok = b.tok AND a.source < b.source
    JOIN totals ta ON ta.source = a.source
    JOIN totals tb ON tb.source = b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(CAST((m - (m % d)) // d AS BIGINT) AS DOUBLE) / 1000000
           AS tv_distance
FROM (
    SELECT s.src_a, s.src_b,
           (coalesce(sh.s_abs, 0)
            + (CAST(s.n_a AS HUGEINT) * s.n_b - coalesce(sh.s_a, 0))
            + (CAST(s.n_a AS HUGEINT) * s.n_b - coalesce(sh.s_b, 0)))
               * 1000000 AS m,
           CAST(2 AS HUGEINT) * s.n_a * s.n_b AS d
    FROM spine s
    LEFT JOIN shared sh ON sh.src_a = s.src_a AND sh.src_b = s.src_b
)
"""


QUERIES["source_token_tv_drift"] = (
    q_source_token_tv_drift,
    SQL_SOURCE_TOKEN_TV_DRIFT,
)


def q_dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality report over the orders feed:
    one row per expectation with passed/failed counts and a micro pass
    rate — the contract a lake pipeline evaluates before publishing a
    partition. Checks span the four standard families:

      completeness  - o_custkey / o_orderdate non-null
      uniqueness    - o_orderkey has no duplicates
      compliance    - o_totalprice > 0; o_orderdate within [1990, 2005)
      referential   - o_custkey resolves against the customer dimension

    All metrics come from ONE pass over orders: the FK check is a
    broadcast left join whose orphan flag rides the scan, every
    row-grain count is a conditional partial in a key-grain pre-agg
    (which is ALSO the uniqueness check), and one 1-row rollup of the
    pre-agg feeds a literal-array explode into the report rows — the
    scan-once shape Deequ compiles its analyzers to, which is what
    makes a 100 TB contract check one job, not one job per rule. (The
    naive CTE form — separate base/uniq/fk CTEs with base referenced by
    five UNION ALL branches — inlines to SEVEN scans of orders; plan
    pinned to one in tests/test_curation_extras.py.)"""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_dq_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_dq_customer")
    return spark.sql(
        """
        WITH keyed AS (
            SELECT o.o_orderkey,
                   count(*) AS c,
                   count(o.o_custkey) AS nn_cust,
                   count(o.o_orderdate) AS nn_date,
                   count(CASE WHEN CAST(o.o_totalprice AS DECIMAL(18,2))
                        > 0 THEN 1 END) AS pos_price,
                   count(CASE WHEN year(o.o_orderdate) >= 1990
                        AND year(o.o_orderdate) < 2005 THEN 1 END)
                       AS in_range,
                   count(CASE WHEN k.c_custkey IS NULL THEN 1 END)
                       AS orphans
            FROM _dq_orders o
            LEFT JOIN _dq_customer k ON o.o_custkey = k.c_custkey
            GROUP BY o.o_orderkey
        ),
        onerow AS (
            SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(nn_cust) AS BIGINT) AS nn_cust,
                   CAST(sum(nn_date) AS BIGINT) AS nn_date,
                   CAST(sum(pos_price) AS BIGINT) AS pos_price,
                   CAST(sum(in_range) AS BIGINT) AS in_range,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS unique_keys,
                   CAST(sum(orphans) AS BIGINT) AS orphans
            FROM keyed
        ),
        report AS (
            SELECT r.expectation, r.passed, r.failed, r.n
            FROM onerow
            LATERAL VIEW explode(array(
                named_struct('expectation', 'completeness:o_custkey',
                    'passed', nn_cust, 'failed', n - nn_cust, 'n', n),
                named_struct('expectation', 'completeness:o_orderdate',
                    'passed', nn_date, 'failed', n - nn_date, 'n', n),
                named_struct('expectation', 'compliance:o_totalprice>0',
                    'passed', pos_price, 'failed', n - pos_price, 'n', n),
                named_struct('expectation', 'compliance:orderdate_in_range',
                    'passed', in_range, 'failed', n - in_range, 'n', n),
                named_struct('expectation', 'uniqueness:o_orderkey',
                    'passed', unique_keys, 'failed', n - unique_keys,
                    'n', n),
                named_struct('expectation', 'referential:o_custkey->customer',
                    'passed', n - orphans, 'failed', orphans, 'n', n)
            )) t AS r
        )
        SELECT expectation, passed, failed,
               CAST(passed * 1000000 DIV n AS DOUBLE) / 1000000 AS pass_rate,
               CAST(CASE WHEN failed = 0 THEN 1 ELSE 0 END AS INT) AS ok
        FROM report
        """
    )


SQL_DQ_EXPECTATIONS_REPORT = """
WITH base AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(o_custkey) AS BIGINT) AS nn_cust,
           CAST(count(o_orderdate) AS BIGINT) AS nn_date,
           CAST(count(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > 0
                THEN 1 END) AS BIGINT) AS pos_price,
           CAST(count(CASE WHEN year(o_orderdate) >= 1990
                AND year(o_orderdate) < 2005 THEN 1 END) AS BIGINT) AS in_range
    FROM orders
),
uniq AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS unique_keys
    FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY o_orderkey)
),
fk AS (
    SELECT CAST(count(*) AS BIGINT) AS orphans
    FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
),
report AS (
    SELECT 'completeness:o_custkey' AS expectation,
           nn_cust AS passed, n - nn_cust AS failed, n FROM base
    UNION ALL
    SELECT 'completeness:o_orderdate', nn_date, n - nn_date, n FROM base
    UNION ALL
    SELECT 'compliance:o_totalprice>0', pos_price, n - pos_price, n FROM base
    UNION ALL
    SELECT 'compliance:orderdate_in_range', in_range, n - in_range, n
    FROM base
    UNION ALL
    SELECT 'uniqueness:o_orderkey', unique_keys, n_rows - unique_keys, n_rows
    FROM uniq
    UNION ALL
    SELECT 'referential:o_custkey->customer', b.n - f.orphans, f.orphans, b.n
    FROM base b CROSS JOIN fk f
)
SELECT expectation, passed, failed,
       CAST(passed * 1000000 // n AS DOUBLE) / 1000000 AS pass_rate,
       CAST(CASE WHEN failed = 0 THEN 1 ELSE 0 END AS INT) AS ok
FROM report
"""


QUERIES["dq_expectations_report"] = (
    q_dq_expectations_report,
    SQL_DQ_EXPECTATIONS_REPORT,
)
