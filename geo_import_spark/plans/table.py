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
        # Stable table uid (the child-view uid the reference's parent
        # metadata lists, services/spatial.js:318-345): the root's
        # basename — deterministic and human-readable.
        self.table_id = os.path.basename(os.path.normpath(root))
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

    def _reader(self, spark: SparkSession, paths: list[str], base_path: str | None):
        r = spark.read
        if base_path:
            # basePath keeps partition-directory columns (unit=...)
            # visible when reading an explicit file list.
            r = r.option("basePath", base_path)
        return r.parquet(*paths)

    def _file_stats(
        self,
        spark: SparkSession,
        files: list[dict],
        stat_cols,
        base_path: str | None = None,
    ):
        """Per-file row counts + min/max column stats (manifest-level
        pruning metadata, as Iceberg keeps per data file). ONE Spark
        job regardless of file count: a single scan of the snapshot's
        file set grouped by input_file_name() — never a per-file
        driver loop (at 100 TB that would be thousands of jobs)."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        if not files:
            return files
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in stat_cols or []:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rows = (
            self._reader(spark, [f["path"] for f in files], base_path)
            .groupBy(F.input_file_name().alias("_file"))
            .agg(*aggs)
            .collect()
        )
        # Match by absolute path, NOT basename: partitioned writes give
        # one task the same part-file name in every unit=... dir.
        by_path = {
            os.path.abspath(unquote(urlparse(r["_file"]).path)): r.asDict()
            for r in rows
        }
        for f in files:
            row = dict(by_path.get(os.path.abspath(f["path"]), {}))
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
        files = self._file_stats(spark, self._collect_files(data_dir), stat_cols)
        return self._write_snapshot(df.schema.jsonValue(), files, mode, properties)

    def commit_files(
        self,
        spark: SparkSession,
        paths: list[str],
        mode: str = "overwrite",
        stat_cols: list[str] | None = None,
        properties: dict | None = None,
        base_path: str | None = None,
    ) -> dict:
        """Commit EXISTING immutable parquet files into a new snapshot
        BY REFERENCE — no data rewrite. This is how a publish stage
        promotes checkpoint output to a table: at 100 TB, `commit(df)`
        would re-read and re-write the whole dataset a second time
        purely to produce a manifest; referencing the already-written
        files costs one stats job and a JSON write (the Iceberg
        add_files / snapshot-of-existing-data pattern).

        `base_path`: when the files live under a partitionBy layout
        (.../unit=3/part-*.parquet), pass the layout root so partition
        columns stay visible; it is recorded in the snapshot and
        re-applied by read()/read_pruned().
        """
        files = [{"path": p, "bytes": os.path.getsize(p)} for p in sorted(paths)]
        files = self._file_stats(spark, files, stat_cols, base_path=base_path)
        schema = (
            self._reader(spark, [f["path"] for f in files], base_path).schema.jsonValue()
            if files
            else None
        )
        return self._write_snapshot(
            schema, files, mode, properties, base_path=base_path
        )

    def _write_snapshot(
        self,
        schema,
        files: list[dict],
        mode: str,
        properties: dict | None,
        base_path: str | None = None,
    ) -> dict:
        parent = self.current_snapshot()
        if mode == "append" and parent:
            files = parent["files"] + files
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        snapshot = {
            "snapshot_id": snap_id,
            "table_id": self.table_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "committed_at": time.time(),
            "schema": schema,
            "files": files,
            "rows": sum(f["rows"] for f in files),
            "properties": properties or {},
        }
        if base_path:
            snapshot["base_path"] = base_path
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
        return self._reader(
            spark, [f["path"] for f in snap["files"]], snap.get("base_path")
        )

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
        return self._reader(spark, keep, snap.get("base_path"))
