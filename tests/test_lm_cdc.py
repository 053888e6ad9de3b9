"""Semantic invariants for the LM-statistics and SCD2/CDC operators
(operators/lm_queries.py). Cross-engine value equality is covered by the
DuckDB oracles; these tests pin the properties the oracle can't state."""

from __future__ import annotations

from collections import defaultdict

from movie_data_transformer_spark.operators.lm_queries import (
    q_cdc_user_state_diff,
    q_scd2_user_value,
    q_text_tfidf_topk,
    q_text_unigram_lm,
)


def test_unigram_lm_bounds(spark, sf_dir):
    rows = q_text_unigram_lm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every token occurs at least once (itself), so sum_freq >= n_tokens
        assert r.min_freq >= 1
        assert r.sum_freq >= r.n_tokens
        assert 0 <= r.rare_tokens <= r.n_tokens
        assert r.avg_freq >= 1.0


def test_tfidf_rare_term_outranks_common(spark, sf_dir):
    rows = q_text_tfidf_topk(spark, sf_dir).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    for doc, rs in per_doc.items():
        assert 1 <= len(rs) <= 3
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # scores weakly decrease with rank
        by_rank = sorted(rs, key=lambda x: x.rank)
        for a, b in zip(by_rank, by_rank[1:]):
            assert a.score >= b.score


def test_scd2_intervals_partition_history(spark, sf_dir):
    rows = q_scd2_user_value(spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for user, versions in per_user.items():
        versions.sort(key=lambda r: (r.valid_from_s, r.event_id))
        # exactly one open (current) version, and it is the last one
        assert [v.is_current for v in versions].count(1) == 1
        assert versions[-1].is_current == 1 and versions[-1].valid_to_s is None
        # intervals are contiguous: each version closes exactly where the
        # next one opens (no gaps, no overlaps)
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to_s == b.valid_from_s
            assert a.valid_from_s <= a.valid_to_s


def test_cdc_change_types_consistent(spark, sf_dir):
    rows = q_cdc_user_state_diff(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.user_id not in seen  # one changeset row per key
        seen.add(r.user_id)
        if r.change_type == "insert":
            assert r.old_total is None and r.new_total is not None
        elif r.change_type == "delete":
            assert r.old_total is not None and r.new_total is None
        elif r.change_type == "update":
            # totals may coincide when only the count changed
            assert r.old_total is not None and r.new_total is not None
        else:
            assert r.change_type == "unchanged"
            assert r.old_total == r.new_total


def test_vocab_encode_round_trip(spark, sf_dir):
    from movie_data_transformer_spark.operators.lm_queries import (
        q_docs_encode_ids,
        q_vocab_build,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    vocab = {r.token_id: r.token for r in q_vocab_build(spark, sf_dir).collect()}
    assert sorted(vocab) == list(range(1, len(vocab) + 1))  # contiguous ids from 1
    enc = {r.doc_id: r for r in q_docs_encode_ids(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    vset = set(vocab.values())
    for d in docs[:50]:
        toks = [t for t in d.text.strip().lower().split() if t]
        r = enc[d.doc_id]
        ids = [int(x) for x in r.ids.split(" ")]
        assert r.n_tokens == len(toks) == len(ids)
        assert r.n_oov == sum(1 for t in toks if t not in vset)
        # decoding every in-vocab id reproduces the original token stream
        for t, i in zip(toks, ids):
            if i == 0:
                assert t not in vset
            else:
                assert vocab[i] == t
