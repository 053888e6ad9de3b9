"""TPC-H-shaped analytical queries adapted to the driver tables' columns —
the classic multi-operator compositions (scan+filter+join+agg+sort) that
exercise the optimizer end-to-end, each with a DuckDB oracle.

(The driver schema is TPC-H-ish but trimmed — no commitdate/receiptdate,
no shippriority, etc. — so these are adaptations, cited per query.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_transformer_spark.functions import decimal_sum, deterministic_avg
from movie_data_transformer_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: pricing summary report — wide aggregate over filtered lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", 2, "sum_qty"),
            decimal_sum("l_extendedprice", 2, "sum_base_price"),
            decimal_sum(disc_price, 4, "sum_disc_price"),
            decimal_sum(charge, 6, "sum_charge"),
            deterministic_avg("l_quantity", 2, "avg_qty"),
            deterministic_avg("l_extendedprice", 2, "avg_price"),
            deterministic_avg("l_discount", 4, "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS sum_disc_price,
       sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top unshipped-revenue orders for a segment (adapted: no
    shippriority column; top-10 by revenue with deterministic tiebreak)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").cast("date") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").cast("date") > F.lit("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue where customer and supplier share a nation, per nation
    (adapted: join on shared nation of customer+supplier, no region cut on
    one side needed since region is tiny here)."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecasting revenue change — pure scan+filter+agg (the
    pushdown showcase)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TPCH_Q6 = """
SELECT sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers who returned items, ranked by lost revenue (top 20)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c, n = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: order priority checking — orders with at least one line shipped
    over 60 days after the order date (EXISTS -> left-semi)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) > 60
    )
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
)
GROUP BY o_orderpriority
"""


def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promotion revenue share — conditional aggregation over a
    broadcast-joined part dimension ('red' parts play PROMO)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        decimal_sum(F.when(F.col("p_name").contains("red"), rev).otherwise(0), 4, "promo_revenue"),
        decimal_sum(rev, 4, "total_revenue"),
        F.round(
            F.sum(F.when(F.col("p_name").contains("red"), rev).otherwise(0).cast("decimal(18,4)"))
            .cast("double")
            / F.sum(rev.cast("decimal(18,4)")).cast("double")
            * 100,
            6,
        ).alias("promo_pct"),
    )


SQL_TPCH_Q14 = """
SELECT sum(CAST(CASE WHEN contains(p_name, 'red')
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END
            AS DECIMAL(18,4))) AS promo_revenue,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue,
       round(CAST(sum(CAST(CASE WHEN contains(p_name, 'red')
                                THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                           AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             * 100, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: volume shipping between distinct nation pairs, by ship year
    (customer nation != supplier nation)."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, c.c_nationkey == F.col("c_nk"))
        .join(n2, s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("int").alias("ship_year"),
        )
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "volume"))
    )


SQL_TPCH_Q7 = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count (incl. zero-order
    customers via left join)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o.filter(F.col("o_orderpriority") != "5-LOW"), c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunctive OR-of-ANDs predicates across a join (brand x size
    x quantity bands) — the predicate-pushdown/CNF stress case."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 10) & (F.col("l_quantity") < 15))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 20) & (F.col("l_quantity") < 30))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 30) & (F.col("l_quantity") < 45))
    )
    return j.filter(cond).agg(
        decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q19 = """
SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size <= 10 AND l_quantity < 15)
   OR (p_brand = 'Brand#22' AND p_size <= 20 AND l_quantity < 30)
   OR (p_brand = 'Brand#33' AND p_size <= 30 AND l_quantity < 45)
"""


def q_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: customers with above-average balance and no orders (scalar
    subquery + anti join), grouped by nation."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("c_acctbal"), 6
        ).alias("a")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    big = o.filter(F.col("o_totalprice") > 200000)
    no_big_orders = rich.join(big, rich.c_custkey == big.o_custkey, "left_anti")
    return no_big_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        decimal_sum("c_acctbal", 2, "totacctbal"),
    )


SQL_TPCH_Q22 = """
WITH avg_bal AS (
    SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(c_acctbal), 6) AS a
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       sum(CAST(c_acctbal AS DECIMAL(18,2))) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
GROUP BY c_nationkey
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: market share — fraction of EUROPE-customer revenue supplied by
    suppliers of one nation, per order year."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("c_rk") == r.r_regionkey)
    )
    yearly = base.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_0", rev).otherwise(0).cast("decimal(18,4)")
        ).alias("nation_rev"),
        F.sum(rev.cast("decimal(18,4)")).alias("total_rev"),
    )
    return yearly.select(
        "o_year",
        "nation_rev",
        "total_rev",
        F.round(F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"), 6).alias(
            "mkt_share"
        ),
    )


SQL_TPCH_Q8 = """
WITH base AS (
    SELECT l_extendedprice * (1 - l_discount) AS rev,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT o_year,
       sum(CAST(CASE WHEN supp_nation = 'NATION_0' THEN rev ELSE 0 END
                AS DECIMAL(18,4))) AS nation_rev,
       sum(CAST(rev AS DECIMAL(18,4))) AS total_rev,
       round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_0' THEN rev ELSE 0 END
                           AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
"""


QUERIES = {
    "tpch_q1_pricing_summary": (q_tpch_q1_pricing_summary, SQL_TPCH_Q1),
    "tpch_q8_market_share": (q_tpch_q8_market_share, SQL_TPCH_Q8),
    "tpch_q19_disjunctive": (q_tpch_q19_disjunctive, SQL_TPCH_Q19),
    "tpch_q22_global_sales_opportunity": (q_tpch_q22_global_sales_opportunity, SQL_TPCH_Q22),
    "tpch_q7_nation_volume": (q_tpch_q7_nation_volume, SQL_TPCH_Q7),
    "tpch_q13_order_distribution": (q_tpch_q13_order_distribution, SQL_TPCH_Q13),
    "tpch_q4_order_priority": (q_tpch_q4_order_priority, SQL_TPCH_Q4),
    "tpch_q14_promo_share": (q_tpch_q14_promo_share, SQL_TPCH_Q14),
    "tpch_q3_shipping_priority": (q_tpch_q3_shipping_priority, SQL_TPCH_Q3),
    "tpch_q5_local_supplier_volume": (q_tpch_q5_local_supplier_volume, SQL_TPCH_Q5),
    "tpch_q6_forecast_revenue": (q_tpch_q6_forecast_revenue, SQL_TPCH_Q6),
    "tpch_q10_returned_items": (q_tpch_q10_returned_items, SQL_TPCH_Q10),
}
