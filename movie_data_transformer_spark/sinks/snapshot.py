"""Versioned snapshot store with TIME TRAVEL — the honest stand-in for
Delta/Iceberg snapshot isolation (neither package ships in this
environment; see NOTES.md boundaries).

Layout (all plain parquet + JSON, no table-format dependency):

    <root>/files/c<version>/pb=<bucket>/part-*.parquet   data (immutable)
    <root>/_manifests/v<version>.json                    live-file list

Every commit is bucket-level COPY-ON-WRITE: a merge rewrites ONLY the
hash buckets its batch touches; the new manifest carries the untouched
buckets' existing directories forward by reference. Old data files are
never modified or deleted, so EVERY prior version stays readable —
`read(version)` unions exactly the directories its manifest lists
(snapshot isolation: a reader of v1 is unaffected by the v2 commit).

The production analogue maps 1:1: data files = Delta parquet files,
manifests = the transaction log's add/remove sets resolved to a live
set, bucket pruning = Delta's partition-pruned MERGE. At 100 TB the
merge cost is (touched buckets' size + batch size), never table size,
and manifests stay tiny (one row per bucket).

The `bucket` column is stored IN the data (as well as in the directory
name) so manifest directories can be read individually without a
basePath reconstruction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 8):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # -- manifests ---------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{version}.json")

    def manifest(self, version: int) -> dict[int, str]:
        """bucket -> data directory (relative to root)."""
        with open(self._manifest_path(version)) as fh:
            raw = json.load(fh)
        return {int(k): v for k, v in raw.items()}

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.root, "_manifests")):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _write_manifest(self, version: int, entries: dict[int, str]) -> None:
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(k): v for k, v in entries.items()}, fh, sort_keys=True)
        os.replace(tmp, self._manifest_path(version))  # atomic publish

    # -- data --------------------------------------------------------------
    def _bucketed(self, df: DataFrame, key: str) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.col(key).cast("bigint"), F.lit(self.n_buckets)).cast("int")
        )

    def _write_buckets(self, df_with_bucket: DataFrame, version: int) -> dict[int, str]:
        """Write one directory per bucket under c<version>; returns the
        bucket -> relative-dir map for the buckets present in df."""
        rel = f"files/c{version}"
        out = os.path.join(self.root, rel)
        (
            df_with_bucket.withColumn("pb", F.col("bucket"))
            .repartition("pb")
            .sortWithinPartitions("pb")
            .write.mode("overwrite")
            .partitionBy("pb")
            .parquet(out)
        )
        return {
            int(name.split("=", 1)[1]): f"{rel}/{name}"
            for name in os.listdir(out)
            if name.startswith("pb=")
        }

    def commit_full(self, df: DataFrame, key: str, version: int) -> None:
        """Initial snapshot: every bucket written, manifest lists them all."""
        self._write_manifest(version, self._write_buckets(self._bucketed(df, key), version))

    def read(self, version: int) -> DataFrame:
        paths = [os.path.join(self.root, rel) for rel in self.manifest(version).values()]
        return self.spark.read.parquet(*paths)

    def merge_additive(
        self, batch: DataFrame, key: str, value_cols: list[str], from_version: int, new_version: int
    ) -> None:
        """Copy-on-write additive merge: per key, numeric value columns of
        the batch ADD to the stored partials (incremental_agg_rollup
        semantics). Only the buckets the batch touches are rewritten; the
        manifest carries every other bucket forward by reference."""
        b = self._bucketed(batch, key)
        touched = sorted(r.bucket for r in b.select("bucket").distinct().collect())
        prev = self.manifest(from_version)
        old_paths = [os.path.join(self.root, prev[t]) for t in touched if t in prev]
        base_cols = [key, "bucket", *value_cols]
        if old_paths:
            state = self.spark.read.parquet(*old_paths).select(*base_cols)
        else:
            state = b.select(*base_cols).limit(0)
        # cast the re-aggregated values BACK to the stored schema's types:
        # sum() widens (decimal(28,4) -> decimal(38,4), etc.), and a
        # partial-bucket commit must not give rewritten buckets a parquet
        # schema the carried-forward buckets don't share — read() of the
        # merged version would fail with a column-type mismatch (the cast
        # throws under ANSI if a value ever outgrows the stored type,
        # which is the loud failure we want). The reference schema comes
        # from ANY stored directory (footer-only read), not just the
        # touched buckets: a batch introducing a brand-new bucket must
        # still write the STORE's types, not its own.
        if prev:
            sample = self.spark.read.parquet(
                os.path.join(self.root, next(iter(sorted(prev.values()))))
            )
            stored_types = {
                f.name: f.dataType for f in sample.schema.fields if f.name in value_cols
            }
        else:
            stored_types = {
                f.name: f.dataType for f in b.schema.fields if f.name in value_cols
            }
        merged = (
            state.unionByName(b.select(*base_cols))
            .groupBy(key, "bucket")
            .agg(*[F.sum(c).cast(stored_types[c]).alias(c) for c in value_cols])
        )
        written = self._write_buckets(merged, new_version)
        entries = dict(prev)
        entries.update(written)
        self._write_manifest(new_version, entries)

    def vacuum(self, keep_versions: list[int]) -> list[str]:
        """Retention: delete every data directory not referenced by any
        kept version's manifest, and drop the other manifests. Returns
        the deleted directories. (The Delta VACUUM analogue — after it,
        time travel only reaches the kept versions.)"""
        import shutil

        keep = set(keep_versions)
        live: set[str] = set()
        for v in keep:
            live.update(self.manifest(v).values())
        deleted: list[str] = []
        files_root = os.path.join(self.root, "files")
        if not os.path.isdir(files_root):
            return deleted  # pre-first-commit store: nothing to retain
        for commit in sorted(os.listdir(files_root)):
            cdir = os.path.join(files_root, commit)
            for name in sorted(os.listdir(cdir)):
                rel = f"files/{commit}/{name}"
                if name.startswith("pb=") and rel not in live:
                    shutil.rmtree(os.path.join(cdir, name))
                    deleted.append(rel)
            if not any(n.startswith("pb=") for n in os.listdir(cdir)):
                # fully vacuumed: only write markers (_SUCCESS) remain
                shutil.rmtree(cdir)
        for v in self.versions():
            if v not in keep:
                os.remove(self._manifest_path(v))
        return deleted
