"""File-level invariants of the versioned snapshot store: bucket-level
copy-on-write (untouched directories are SHARED by reference between
manifests), snapshot isolation (v1 reads identically after the v2
commit), and additive merge correctness for new and existing keys."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from movie_data_transformer_spark.sinks.snapshot import SnapshotTable


def _state(spark, rows):
    return spark.createDataFrame(rows, "user_id long, total long, n long")


def test_cow_sharing_and_snapshot_isolation(spark):
    root = tempfile.mkdtemp(prefix="snapstore_test_")
    st = SnapshotTable(spark, root, n_buckets=8)
    # users 0..15 -> every bucket 0..7 holds exactly two users
    st.commit_full(_state(spark, [(u, 10 * u, 1) for u in range(16)]), "user_id", 1)
    v1_before = {(r.user_id, r.total, r.n) for r in st.read(1).collect()}

    # batch touches users 3 and 11 -> ONLY bucket 3; user 100 -> bucket 4
    st.merge_additive(
        _state(spark, [(3, 5, 1), (11, 7, 2), (100, 1, 1)]),
        "user_id",
        ["total", "n"],
        from_version=1,
        new_version=2,
    )
    m1, m2 = st.manifest(1), st.manifest(2)
    # COW: exactly buckets {3, 4} point at new directories; the other six
    # carry the v1 directories forward BY REFERENCE (same path string)
    changed = {b for b in m1 if m2[b] != m1[b]}
    assert changed == {3, 4}
    assert all(m2[b] == m1[b] for b in m1 if b not in changed)
    assert all("c2" in m2[b] for b in changed) and all("c1" in m1[b] for b in m1)

    # snapshot isolation: v1 reads bit-identically AFTER the v2 commit
    assert {(r.user_id, r.total, r.n) for r in st.read(1).collect()} == v1_before

    v2 = {r.user_id: (r.total, r.n) for r in st.read(2).collect()}
    assert v2[3] == (35, 2) and v2[11] == (117, 3)  # additive merge
    assert v2[100] == (1, 1)  # new key lands in an existing bucket
    assert v2[4] == (40, 1) and v2[12] == (120, 1)  # bucket-4 oldies kept
    untouched = {u: v2[u] for u in (0, 1, 2, 5)}
    assert untouched == {u: (10 * u, 1) for u in (0, 1, 2, 5)}
    assert len(v2) == 17


def test_versions_listing_and_read_paths(spark):
    root = tempfile.mkdtemp(prefix="snapstore_test2_")
    st = SnapshotTable(spark, root, n_buckets=4)
    st.commit_full(_state(spark, [(u, u, 1) for u in range(8)]), "user_id", 1)
    st.merge_additive(
        _state(spark, [(0, 1, 1)]), "user_id", ["total", "n"], 1, 2
    )
    assert st.versions() == [1, 2]
    # the bucket column is stored in the data so leaf dirs read standalone
    assert "bucket" in st.read(2).columns
    assert st.read(2).filter(F.col("user_id") == 0).collect()[0].total == 1
