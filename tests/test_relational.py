"""Relational operator library: plan-shape and approx-aggregate checks.

(Value correctness for all registry queries is covered by the DuckDB
oracle differential — tools/check_oracle.py; these tests pin the physical
plan properties the oracle can't see.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.relational_queries import (
    q_join_multiway,
    q_sort_limit_topn,
    q_window_topk_per_group,
)
from movie_data_transformer_spark.operators.tpch_queries import (
    q_tpch_q17_small_quantity_revenue,
    q_tpch_q21_suppliers_who_kept_waiting,
)
from movie_data_transformer_spark.sources.tables import load_table


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    plan = q_join_multiway(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dims must not shuffle the fact side


def test_topn_uses_take_ordered(spark, sf_dir):
    plan = q_sort_limit_topn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT


def test_topk_per_group_single_shuffle(spark, sf_dir):
    plan = q_window_topk_per_group(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window partition keys; the dim join is broadcast
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q17_correlated_subquery_broadcasts(spark, sf_dir):
    # the per-part avg side and the filtered part dim are both broadcast:
    # the lineitem fact must never shuffle for the rejoin
    plan = (
        q_tpch_q17_small_quantity_revenue(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q21_set_window_no_cartesian(spark, sf_dir):
    # EXISTS / NOT EXISTS are computed as collect_set sizes over the
    # l_orderkey window (one pass of the order-line relation, no
    # semi/anti self-joins) — never a cartesian product
    plan = (
        q_tpch_q21_suppliers_who_kept_waiting(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "CartesianProduct" not in plan


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_percentile_matches_duckdb(spark, sf_dir):
    import duckdb

    got = (
        load_table(spark, sf_dir, "lineitem")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("p50"))
        .collect()[0]["p50"]
    )
    want = duckdb.sql(
        f"SELECT quantile_cont(l_quantity, 0.5) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert abs(got - want) < 1e-9


def test_fuzzy_name_match_blocks_and_distance(spark, sf_dir):
    from movie_data_transformer_spark.operators.relational_queries import (
        q_fuzzy_name_match,
    )

    rows = q_fuzzy_name_match(spark, sf_dir).collect()
    assert len(rows) > 0
    names = {
        r.p_name
        for r in load_table(spark, sf_dir, "part").select("p_name").distinct().collect()
    }
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    for r in rows:
        assert r.name_a in names and r.name_b in names
        assert r.name_a < r.name_b
        assert r.name_a.split()[-1] == r.name_b.split()[-1]  # same noun block
        assert 1 <= r.edit_dist <= 4
        assert lev(r.name_a, r.name_b) == r.edit_dist


def test_bloom_prune_no_false_negatives_and_audit_consistent(spark, sf_dir):
    """A Bloom filter can only over-approximate: every order whose
    customer IS in the dim must survive pruning (n_exact_match equals
    the independent exact semi-join count), candidates never exceed the
    facts, and the bit table never exceeds keys x k."""
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.relational_queries import (
        q_join_bloom_prune,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    row = q_join_bloom_prune(spark, sf_dir).collect()[0]
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    dim = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == "EUROPE"), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    exact = o.join(dim, o.o_custkey == dim.c_custkey, "left_semi").count()
    assert row.n_exact_match == exact  # no false negatives, ever
    assert row.n_bf_pass >= row.n_exact_match  # FP-only over-approximation
    assert row.n_false_pos == row.n_bf_pass - row.n_exact_match
    assert row.n_bf_pass <= row.n_fact_rows
    assert 0 < row.n_bits_set <= row.n_dim_keys * 3


def test_quantile_sketch_brackets_exact_order_statistic(spark, sf_dir):
    """The $1-grid sketch's [est_lo, est_hi) must contain the EXACT
    ceil-rank order statistic for every (event_type, q) — the bounded-
    error guarantee that makes stored sketch partials usable in place of
    a full sort at 100 TB."""
    from collections import defaultdict

    from movie_data_transformer_spark.operators.relational_queries import (
        q_agg_quantile_sketch,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    got = {
        (r.event_type, r.q): (r.n_total, r.est_lo_cents, r.est_hi_cents)
        for r in q_agg_quantile_sketch(spark, sf_dir).collect()
    }
    assert got and {q for _, q in got} == {50, 90, 99}
    vals = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc")
        .collect()
    ):
        vals[r.event_type].append(r.vc)
    for et in vals:
        vals[et].sort()
    for (et, q), (n_total, lo, hi) in got.items():
        assert n_total == len(vals[et])
        assert hi - lo == 100  # one-bin bracket, always
        rank = -(-n_total * q // 100)  # ceil
        exact = vals[et][rank - 1]
        assert lo <= exact < hi, (et, q, exact, lo, hi)


def test_cms_one_sided_guarantee_for_every_user(spark, sf_dir):
    """CMS never undercounts: est >= true for EVERY probed key (not just
    the returned top-20), and the expected-overcount bound n*d/w is a
    sane sanity ceiling at this scale."""
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.relational_queries import (
        q_agg_cms_heavy_hitters,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    top = q_agg_cms_heavy_hitters(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(top) == min(20, n_users)
    assert all(r.overcount >= 0 for r in top)
    assert all(r.est_n == r.true_n + r.overcount for r in top)
    n = load_table(spark, sf_dir, "events").count()
    # overcount is bounded by the colliding mass; with w=1024 buckets the
    # per-row expected collision mass is ~n/1024 — allow 20x headroom so
    # the assertion gates collapse (e.g. a broken hash sending everything
    # to one bucket), not statistical noise
    assert all(r.overcount <= max(20 * n // 1024, 50) for r in top)


def test_join_strategy_hints_steer_the_planner(spark, sf_dir):
    """Join-strategy hints are the user's scale lever when the optimizer
    guesses wrong (a 'small' dim that is actually huge, or vice versa):
    the SAME logical join must compile to a broadcast hash join under
    .hint('broadcast'), a sort-merge join under .hint('merge'), and a
    shuffle hash join under .hint('shuffle_hash') — with identical
    results in all three."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def plan(hinted):
        df = o.join(hinted, o.o_custkey == c.c_custkey).groupBy(
            "c_mktsegment"
        ).count()
        rows = df.collect()
        return rows, df._jdf.queryExecution().executedPlan().toString()

    res = {}
    for hint, marker in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        rows, p = plan(c.hint(hint))
        assert marker in p, (hint, p[:400])
        res[hint] = sorted((r.c_mktsegment, r["count"]) for r in rows)
    assert res["broadcast"] == res["merge"] == res["shuffle_hash"]


def test_grid_spatial_join_boundary_cells(spark):
    """The grid decomposition must not lose border points: a point on a
    box edge that sits in a DIFFERENT cell than the box's anchor still
    joins (the box explodes onto every covered cell), and a point one
    unit outside never joins."""
    from movie_data_transformer_spark.operators.geo_extras_queries import (
        CELL,
    )

    # box [95, 205] x [95, 205] covers cells 0-2 on both axes; probe
    # points at the exact corners, at a cell boundary inside, and just
    # outside
    box = (95, 95, 205, 205)
    pts = {
        (95, 95): True,
        (205, 205): True,   # far corner, cell (2,2) != anchor cell (0,0)
        (100, 100): True,   # exactly on a cell boundary
        (206, 205): False,  # one unit out in x
        (94, 95): False,
    }
    points = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "pid long, px long, py long"
    )
    boxes = spark.createDataFrame([(0,) + box], "bid long, x0 long, y0 long, x1 long, y1 long")
    points.createOrReplaceTempView("_gt_points")
    boxes.createOrReplaceTempView("_gt_boxes")
    rows = spark.sql(
        f"""
        WITH box_cells AS (
            SELECT bid, x0, y0, x1, y1, cx, cy FROM _gt_boxes
            LATERAL VIEW explode(sequence(x0 DIV {CELL}, x1 DIV {CELL})) t1 AS cx
            LATERAL VIEW explode(sequence(y0 DIV {CELL}, y1 DIV {CELL})) t2 AS cy
        )
        SELECT p.pid FROM _gt_points p JOIN box_cells b
          ON b.cx = p.px DIV {CELL} AND b.cy = p.py DIV {CELL}
        WHERE p.px BETWEEN b.x0 AND b.x1 AND p.py BETWEEN b.y0 AND b.y1
        """
    ).collect()
    got = {r.pid for r in rows}
    want = {i for i, (xy, inside) in enumerate(pts.items()) if inside}
    assert got == want
