"""Markov-chain invariants: transition mass conservation, row-stochastic
micro rows, typicality bounds."""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.markov_queries import (
    q_events_markov_transitions,
    q_events_markov_user_typicality,
)
from movie_data_transformer_spark.sources.tables import load_table


def test_transitions_conserve_mass_and_rows_stochastic(spark, sf_dir):
    rows = q_events_markov_transitions(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user with k events contributes k-1 transitions
    assert sum(r.n_transitions for r in rows) == n_events - n_users

    by_from = defaultdict(list)
    for r in rows:
        by_from[r.from_type].append(r)
    for from_type, group in by_from.items():
        total_p = sum(r.p_micro for r in group)
        # truncating division loses < 1 micro per cell
        assert 1_000_000 - len(group) < total_p <= 1_000_000
        ns = sum(r.n_transitions for r in group)
        for r in group:
            assert r.p_micro == r.n_transitions * 1_000_000 // ns


def test_typicality_bounded_and_weighted_mean_consistent(spark, sf_dir):
    rows = q_events_markov_user_typicality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.typicality_micro <= 1_000_000
        assert r.n_transitions >= 1
    # every user with >= 2 events appears
    ev = load_table(spark, sf_dir, "events")
    want_users = {
        r.user_id
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        if r.n >= 2
    }
    assert {r.user_id for r in rows} == want_users
