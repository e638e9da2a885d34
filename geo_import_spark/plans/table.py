"""Iceberg-style table layout implemented in-repo (no Iceberg runtime
jars in this environment — SURVEY §4.3): Parquet data files + JSON
snapshot manifests with per-file stats, atomic commit by pointer-file
rename. Swapping in real Iceberg later is a config change; every
checkpoint/lineage/metrics semantic of the north rule lives here.

Layout:
    <root>/data/<uuid>/part-*.parquet      (immutable file sets)
    <root>/manifests/snapshot-<n>.json     (file list + stats + schema)
    <root>/metadata.json                   (current snapshot pointer)

Commit protocol: write data files -> write snapshot manifest ->
os.replace() the pointer (atomic on POSIX). Readers resolve the
pointer first, so a killed writer never corrupts the table; orphaned
data dirs from failed commits are invisible and GC-able.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Table:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- metadata ------------------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "metadata.json")

    def current_snapshot(self) -> dict | None:
        try:
            with open(self._pointer_path()) as f:
                pointer = json.load(f)
        except FileNotFoundError:
            return None
        with open(pointer["snapshot"]) as f:
            return json.load(f)

    def snapshots(self) -> list[str]:
        d = os.path.join(self.root, "manifests")
        return sorted(os.listdir(d))

    # -- write ---------------------------------------------------------------

    def _collect_files(self, data_dir: str) -> list[dict]:
        files = []
        for name in sorted(os.listdir(data_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(data_dir, name)
            files.append({"path": path, "bytes": os.path.getsize(path)})
        return files

    def _file_stats(self, spark: SparkSession, data_dir: str, files: list[dict], stat_cols):
        """Per-file row counts + min/max column stats (manifest-level
        pruning metadata, as Iceberg keeps per data file). ONE Spark
        job regardless of file count: a single scan of the snapshot's
        data dir grouped by input_file_name() — never a per-file
        driver loop (at 100 TB that would be thousands of jobs)."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        if not files:
            return files
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in stat_cols or []:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rows = (
            spark.read.parquet(data_dir)
            .groupBy(F.input_file_name().alias("_file"))
            .agg(*aggs)
            .collect()
        )
        by_base = {
            os.path.basename(unquote(urlparse(r["_file"]).path)): r.asDict()
            for r in rows
        }
        for f in files:
            row = dict(by_base.get(os.path.basename(f["path"]), {}))
            row.pop("_file", None)
            f["rows"] = row.pop("_rows", 0)
            f["stats"] = row
        return files

    def commit(
        self,
        spark: SparkSession,
        df: DataFrame,
        mode: str = "overwrite",
        stat_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> dict:
        """Write df as a new snapshot. mode: 'overwrite' replaces the
        file set; 'append' adds to the current one."""
        data_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.parquet(data_dir)
        files = self._file_stats(spark, data_dir, self._collect_files(data_dir), stat_cols)

        parent = self.current_snapshot()
        if mode == "append" and parent:
            files = parent["files"] + files
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        snapshot = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "committed_at": time.time(),
            "schema": df.schema.jsonValue(),
            "files": files,
            "rows": sum(f["rows"] for f in files),
            "properties": properties or {},
        }
        snap_path = os.path.join(self.root, "manifests", f"snapshot-{snap_id:06d}.json")
        with open(snap_path, "w") as f:
            json.dump(snapshot, f)
        tmp = self._pointer_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap_path}, f)
        os.replace(tmp, self._pointer_path())  # atomic commit
        return snapshot

    # -- read ----------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        return spark.read.parquet(*[f["path"] for f in snap["files"]])

    def read_pruned(self, spark: SparkSession, col: str, lo, hi) -> DataFrame:
        """Manifest-stats file pruning: only read files whose [min,max]
        for `col` intersects [lo, hi] — the Iceberg scan-planning
        equivalent, cutting IO before Spark ever lists a file."""
        snap = self.current_snapshot()
        keep = [
            f["path"]
            for f in snap["files"]
            if f["stats"].get(f"min_{col}") is None
            or not (f["stats"][f"max_{col}"] < lo or f["stats"][f"min_{col}"] > hi)
        ]
        if not keep:
            return self.read(spark).limit(0)
        return spark.read.parquet(*keep)
