"""Op-16 pipeline counters (observe-based) + op-14 poison-file tolerance."""

from __future__ import annotations

from movie_data_transformer_spark.operators.metrics import (
    merge_flat_with_metrics,
    read_merge_metrics,
)
from movie_data_transformer_spark.schemas import RATING_FLAT


def _flat(spark, rows):
    data = [(m, f"T_{m}", 2000, c, r, d) for (m, c, r, d) in rows]
    return spark.createDataFrame(data, RATING_FLAT)


def test_merge_metrics_taxonomy(spark):
    state = _flat(
        spark,
        [
            ("m1", "c1", 3, "2024-01-01"),  # will be updated (newer batch)
            ("m2", "c1", 4, "2024-02-01"),  # kept (tie)
            ("m3", "c2", 2, "2024-03-01"),  # kept (no batch row)
        ],
    )
    batch = _flat(
        spark,
        [
            ("m1", "c1", 5, "2024-06-01"),  # update
            ("m2", "c1", 1, "2024-02-01"),  # tie -> keep existing
            ("m9", "c9", 3, "2024-04-01"),  # insert
        ],
    )
    merged, obs = merge_flat_with_metrics(state, batch)
    rows = merged.collect()  # action materializes the observation
    m = read_merge_metrics(obs)
    assert (m.n_out, m.n_inserted, m.n_updated, m.n_kept) == (4, 1, 1, 2)
    assert len(rows) == 4
    assert "_decision" not in merged.columns


def test_ignore_corrupt_files(spark, sf_dir, tmp_path):
    """Op 14: the reference retries a bad file 3x then SKIPS it and keeps
    going (:124-126). Spark equivalent: ignoreCorruptFiles — poison files
    are dropped, the job succeeds on the healthy ones."""
    import shutil

    d = tmp_path / "data"
    d.mkdir()
    shutil.copy(f"{sf_dir}/region.parquet", d / "good.parquet")
    (d / "poison.parquet").write_bytes(b"NOT A PARQUET FILE")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.parquet(str(d)).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert got == 5  # region rows from the good file only
