"""Spark 4 SQL-surface extensions: WITH RECURSIVE + VARIANT semantics."""

from __future__ import annotations

from movie_data_transformer_spark.operators.sql_surface_queries import (
    q_expr_variant,
    q_sql_recursive_cte,
)
from movie_data_transformer_spark.sources.tables import load_table


def test_recursive_cte_covers_every_customer_exactly_once(spark, sf_dir):
    out = q_sql_recursive_cte(spark, sf_dir).collect()
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_nodes for r in out) == n_customers
    assert {r.root for r in out} == set(range(10))
    # depth = digit count - 1 under the div-10 hierarchy (keys 0..N-1)
    max_key = n_customers - 1
    assert max(r.depth for r in out) == len(str(max_key)) - 1
    # level sizes: root r at depth d spans keys [r*10^d, (r+1)*10^d)
    for r in out:
        lo = r.root * 10**r.depth
        hi = min((r.root + 1) * 10 ** r.depth, n_customers)
        assert r.n_nodes == hi - lo
        assert (r.min_key, r.max_key) == (lo, hi - 1)


def test_variant_extraction_binds_to_source_columns(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = q_expr_variant(spark, sf_dir).collect()
    assert sum(r.n_missing for r in out) == 0  # miss path -> NULL, counted 0
    assert sum(r.sum_eid for r in out) == ev.selectExpr("sum(event_id) s").first().s
    assert sum(r.n_rows for r in out) == ev.count()


def test_try_variant_get_null_on_type_mismatch(spark):
    """try_variant_get: a non-numeric string under a bigint typed-get is
    NULL (the strict variant_get form raises) — the miss-handling
    distinction the entry's 'missing' column relies on."""
    row = spark.sql(
        "SELECT try_variant_get(parse_json('{\"t\": \"click\"}'), '$.t', 'bigint') AS x,"
        "       try_variant_get(parse_json('{\"t\": \"click\"}'), '$.t', 'string') AS s"
    ).first()
    assert row.x is None and row.s == "click"


def test_zorder_tiles_bound_both_dimensions(spark, sf_dir):
    """Morton tiles with span 4096 fix the top two bucket bits of BOTH
    dimensions (64-wide ranges), so a selective probe on either dimension
    skips most tiles; linear tiles bound only their own dimension."""
    from movie_data_transformer_spark.operators.layout_queries import (
        q_zorder_tile_stats,
    )

    rows = q_zorder_tile_stats(spark, sf_dir).collect()
    zt = [r for r in rows if r.layout == "zorder"]
    lin = [r for r in rows if r.layout == "linear"]
    assert zt and lin
    for r in zt:
        assert r.max_b1 - r.min_b1 <= 63 and r.max_b2 - r.min_b2 <= 63
    for r in lin:
        assert r.max_b1 - r.min_b1 <= 15  # linear bounds its own dim tightly

    # a point probe on the dim LINEAR DOESN'T CLUSTER (b2 = 128) touches
    # at most the 4 zorder tiles of the b2 in [128, 192) band, but most
    # linear tiles (each spans nearly the full b2 range it has data for)
    z_touched = sum(1 for r in zt if r.min_b2 <= 128 <= r.max_b2)
    lin_touched = sum(1 for r in lin if r.min_b2 <= 128 <= r.max_b2)
    assert z_touched <= 4
    assert lin_touched >= len(lin) // 2
    assert 2 * z_touched < lin_touched


def test_arrow_udf_token_count_matches_jvm_expression(spark):
    """The Arrow scalar UDF replicates tokens() = split(trim(s), '\\s+')
    exactly on the divergence cases: [''] -> 1 on empty input, trailing
    non-space whitespace survives trim (so 'a b\\n' counts a trailing
    empty token like both engines), Unicode whitespace (NBSP) is NOT a
    separator, and NULL stays NULL instead of crashing."""
    import re

    from pyspark.sql import functions as F

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.udf("bigint", useArrow=True)
    def py_token_count(s: str | None) -> int | None:
        if s is None:
            return None
        return len(ws.split(s.strip(" ")))

    df = spark.createDataFrame(
        [
            ("",),
            ("   ",),
            ("a b",),
            ("a\n\n b\tc ",),
            ("one",),
            ("a b\n",),  # SQL trim keeps the \n -> trailing '' token
            ("x\u00a0y",),  # NBSP: not a Java/DuckDB \s separator
            (None,),
        ],
        "text string",
    )
    rows = df.select(
        py_token_count("text").alias("py"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("jvm"),
    ).collect()
    # size(NULL) is -1 under Spark's legacy convention; the UDF (like the
    # DuckDB oracle's len(NULL)) yields NULL — compare non-null rows only
    assert all(r.py == r.jvm for r in rows if r.py is not None)
    assert [r.py for r in rows] == [1, 1, 2, 3, 1, 3, 1, None]


def test_theta_exact_below_capacity_approx_above(spark):
    """The oracle strategy for agg_theta_setops rests on Theta sketches
    being EXACT below nominal capacity (lgK=12 -> 4096 retained): pin
    that, and pin the graceful ~2%-error regime above capacity."""
    small = spark.sql(
        "SELECT theta_sketch_estimate(theta_sketch_agg(id)) e FROM range(3000)"
    ).first()
    assert small.e == 3000  # exact mode
    big = spark.sql(
        "SELECT theta_sketch_estimate(theta_sketch_agg(id)) e FROM range(100000)"
    ).first()
    assert abs(big.e - 100000) / 100000 < 0.02  # estimation mode, bounded
    # empty input -> empty sketch -> estimate 0 (not NULL): the behavior
    # the per-day partials rely on for days with no purchases
    empty = spark.sql(
        "SELECT theta_sketch_estimate(theta_sketch_agg(CASE WHEN id < 0 THEN id END)) e"
        " FROM range(10)"
    ).first()
    assert empty.e == 0


def test_df_transpose_matches_long_form(spark, sf_dir):
    """DataFrame.transpose(): columns are the five region names + key,
    rows are the two metrics, and every transposed cell equals the
    long-form aggregate it came from."""
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.function_packs import q_df_transpose
    from movie_data_transformer_spark.sources.tables import load_table

    t = q_df_transpose(spark, sf_dir)
    assert t.columns == [
        "key", "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST",
    ]
    rows = {r.key: r for r in t.collect()}
    assert set(rows) == {"n_nations", "n_customers"}
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    long = {
        r.r_name: r
        for r in region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(customer, nation.n_nationkey == customer.c_nationkey, "left")
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("n_nations"),
            F.count("c_custkey").alias("n_customers"),
        )
        .collect()
    }
    for name, agg in long.items():
        assert rows["n_nations"][name] == agg.n_nations
        assert rows["n_customers"][name] == agg.n_customers


def test_sql_param_exec_binds_not_splices(spark, sf_dir):
    """The parameterized form must equal the literal classic form, and
    a parameter value that LOOKS like SQL must bind as a plain string
    (no injection through args)."""
    from movie_data_transformer_spark.operators.sql_lang_queries import (
        q_sql_param_exec,
    )

    got = {r.c_mktsegment: r for r in q_sql_param_exec(spark, sf_dir).collect()}
    assert "MACHINERY" not in got and len(got) == 4
    lit = spark.sql(
        """
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders
        FROM _param_orders o JOIN _param_cust c ON o.o_custkey = c.c_custkey
        WHERE CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  >= _param_cutoff_cents
          AND c.c_mktsegment <> 'MACHINERY'
        GROUP BY 1
        """
    ).collect()
    assert {r.c_mktsegment: r.n_orders for r in lit} == {
        k: v.n_orders for k, v in got.items()
    }
    # a hostile parameter binds as a VALUE: filtering on a nonsense
    # segment name drops nothing (it matches no rows), never parses
    evil = spark.sql(
        "SELECT count(*) AS c FROM _param_cust WHERE c_mktsegment = :seg",
        args={"seg": "x' OR '1'='1"},
    ).collect()[0].c
    assert evil == 0
