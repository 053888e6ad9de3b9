"""Ops 14/16 registry entries: file-level skip and merge counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.movie_queries import _exploded
from movie_data_transformer_spark.operators.reliability_queries import (
    BAD_FILE,
    N_FILES,
    q_merge_metrics,
    q_movies_file_skip,
)


def test_file_skip_drops_whole_file(spark, sf_dir):
    """The poisoned file's VALID docs are lost too (file-level skip, unlike
    op 15's line-level drop), and every clean file survives intact."""
    full = _exploded(spark, sf_dir)
    kept = q_movies_file_skip(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5("movieId"), 1, 8), 16, 10).cast("bigint") % N_FILES
    n_full = full.count()
    n_poisoned = full.filter(bucket == BAD_FILE).count()
    assert n_poisoned > 0  # the skipped file really held data
    assert kept.count() == n_full - n_poisoned
    assert kept.filter(bucket == BAD_FILE).count() == 0


def test_skip_bad_files_null_struct_line_marks_file_bad(spark, tmp_path):
    """A literal `null` (or whitespace) line decodes to a NULL struct with
    the corrupt column ALSO null — it must still mark the whole file bad
    (whole-file-fails semantics), never leak an all-null phantom row
    (ADVICE r3 / sources/jsonl.py)."""
    import json

    from movie_data_transformer_spark.sources.jsonl import (
        read_movies_jsonl_skip_bad_files,
    )

    doc = {
        "movieId": "m1",
        "title": "T",
        "yearOfRelease": 2000,
        "watchedBy": [{"customer-id": "c1", "movie-id": "m1", "rating": 5, "date": "2024-01-01"}],
    }
    good = tmp_path / "good.json"
    good.write_text(json.dumps(doc) + "\n")
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({**doc, "movieId": "m2"}) + "\nnull\n")
    rows = read_movies_jsonl_skip_bad_files(spark, str(tmp_path)).collect()
    # the null-line file is skipped WHOLE (its valid m2 doc lost);
    # no phantom all-null row survives
    assert [r["movieId"] for r in rows] == ["m1"]


def test_merge_metrics_match_decision_counts(spark, sf_dir):
    """The observe()-based counter row equals a direct aggregation of the
    decision column (one job vs two — same numbers)."""
    from movie_data_transformer_spark.operators.merge import merge_flat
    from movie_data_transformer_spark.operators.merge_queries import _day_parity

    got = q_merge_metrics(spark, sf_dir).collect()[0]
    flat = _exploded(spark, sf_dir)
    merged = merge_flat(
        flat.filter(_day_parity() == 0),
        flat.filter(_day_parity() == 1),
        with_decision=True,
    )
    want = {r["_decision"]: r["n"] for r in merged.groupBy("_decision").agg(F.count("*").alias("n")).collect()}
    assert got.n_inserted == want.get("insert", 0)
    assert got.n_updated == want.get("update", 0)
    assert got.n_kept == want.get("keep", 0)
    assert got.n_out == sum(want.values())
