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

    def snapshot(self, snapshot_id: int) -> dict:
        """Load a specific manifest by id (time-travel lookup)."""
        path = os.path.join(
            self.root, "manifests", f"snapshot-{snapshot_id:06d}.json"
        )
        with open(path) as f:
            return json.load(f)

    def snapshot_log(self) -> list[dict]:
        """History view (Iceberg `.history` equivalent): one row per
        committed snapshot — id, parent, commit time, rows, and the
        change kind inferred from the file-set delta (append = parent
        files all retained; overwrite = file set replaced)."""
        log = []
        for name in self.snapshots():
            with open(os.path.join(self.root, "manifests", name)) as f:
                s = json.load(f)
            if s["parent_id"] is None:
                kind = "create"
            else:
                try:
                    parent_paths = {
                        f_["path"] for f_ in self.snapshot(s["parent_id"])["files"]
                    }
                except FileNotFoundError:  # parent expired
                    parent_paths = None
                kind = (
                    "unknown"
                    if parent_paths is None
                    else "append"
                    if parent_paths <= {f_["path"] for f_ in s["files"]}
                    else "overwrite"
                )
            log.append(
                {
                    "snapshot_id": s["snapshot_id"],
                    "parent_id": s["parent_id"],
                    "committed_at": s["committed_at"],
                    "rows": s["rows"],
                    "kind": kind,
                }
            )
        return log

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
            # Appending a different schema would poison every future
            # scan of the mixed file set (Parquet type mismatch at
            # read time, far from the write that caused it) — fail
            # the commit instead. Name->type comparison, order-
            # insensitive, like Iceberg's schema compatibility check.
            old = parent.get("schema")
            if old and schema:
                # types may be nested dicts (struct/array) — compare
                # canonical JSON, not raw values
                old_f = {
                    f_["name"]: json.dumps(f_["type"], sort_keys=True)
                    for f_ in old["fields"]
                }
                new_f = {
                    f_["name"]: json.dumps(f_["type"], sort_keys=True)
                    for f_ in schema["fields"]
                }
                if old_f != new_f:
                    diff = sorted(
                        k
                        for k in old_f.keys() | new_f.keys()
                        if old_f.get(k) != new_f.get(k)
                    )
                    raise ValueError(
                        f"append schema mismatch vs current snapshot: {diff}"
                    )
            files = parent["files"] + files
        # ids come from the manifest dir, not parent+1: after a
        # rollback the parent is an old snapshot but ids must never be
        # reused (manifests are immutable history).
        existing = self.snapshots()
        snap_id = (
            int(existing[-1].split("-")[1].split(".")[0]) + 1 if existing else 0
        )
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

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to `snapshot_id`
        (Iceberg `VERSION AS OF`): manifests are immutable, so any
        historical file set is still readable until expired."""
        snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        return self._reader(
            spark, [f["path"] for f in snap["files"]], snap.get("base_path")
        )

    def read_incremental(
        self, spark: SparkSession, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Changelog scan (Iceberg incremental read): ONLY the files
        added after `from_snapshot_id` up to `to_snapshot_id` (default:
        current). This is what a downstream consumer of the pipeline's
        append-mode lineage/metrics tables polls — at 100 TB it reads
        the delta, never the table. Appends only: an overwrite snapshot
        in the range invalidates file-delta semantics, so it raises."""
        to_snap = (
            self.current_snapshot()
            if to_snapshot_id is None
            else self.snapshot(to_snapshot_id)
        )
        from_snap = self.snapshot(from_snapshot_id)
        from_paths = {f["path"] for f in from_snap["files"]}
        to_paths = {f["path"] for f in to_snap["files"]}
        if not from_paths <= to_paths:
            raise ValueError(
                f"snapshot range {from_snapshot_id}..{to_snap['snapshot_id']} "
                "contains an overwrite; incremental read requires append-only history"
            )
        new = sorted(to_paths - from_paths)
        if not new:
            return self.read(spark).limit(0)
        return self._reader(spark, new, to_snap.get("base_path"))

    def rollback(self, snapshot_id: int) -> dict:
        """Repoint the table at an earlier snapshot (Iceberg
        rollback_to_snapshot): one atomic pointer swap, no data IO —
        the recovery path when a published snapshot turns out bad."""
        snap = self.snapshot(snapshot_id)  # raises if it never existed
        snap_path = os.path.join(
            self.root, "manifests", f"snapshot-{snapshot_id:06d}.json"
        )
        tmp = self._pointer_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap_path}, f)
        os.replace(tmp, self._pointer_path())
        return snap

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Expire old manifests and GC data files no retained snapshot
        references (Iceberg expire_snapshots + remove_orphan_files).
        Keeps the newest `keep_last` manifests, always including the
        one the pointer currently targets (so a rolled-back table never
        loses its live snapshot). Only files under this table's own
        data/ dir are deleted — commit_files() snapshots referencing
        external checkpoint parquet never GC the checkpoint."""
        names = self.snapshots()
        current = self.current_snapshot()
        keep_names = set(names[-keep_last:]) if keep_last > 0 else set()
        if current is not None:
            keep_names.add(f"snapshot-{current['snapshot_id']:06d}.json")
        live_paths: set[str] = set()
        for name in keep_names:
            with open(os.path.join(self.root, "manifests", name)) as f:
                live_paths |= {f_["path"] for f_ in json.load(f)["files"]}
        data_root = os.path.abspath(os.path.join(self.root, "data"))
        removed_files = 0
        for name in names:
            if name in keep_names:
                continue
            with open(os.path.join(self.root, "manifests", name)) as f:
                for f_ in json.load(f)["files"]:
                    p = os.path.abspath(f_["path"])
                    if p in live_paths or not p.startswith(data_root + os.sep):
                        continue
                    try:
                        os.remove(p)
                        removed_files += 1
                    except FileNotFoundError:
                        pass
            os.remove(os.path.join(self.root, "manifests", name))
        # drop now-empty data dirs (cosmetic; harmless if racy)
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not os.listdir(full):
                os.rmdir(full)
        return {
            "expired_manifests": len(names) - len(keep_names & set(names)),
            "removed_files": removed_files,
        }

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        small_file_bytes: int | None = None,
        sort_by: list[str] | None = None,
        stat_cols: list[str] | None = None,
    ) -> dict:
        """Bin-pack small files into ~target-size files (Iceberg
        rewrite_data_files). Long-running append pipelines (the
        checkpoint stages, the lineage/metrics tables) accrete one
        small parquet per unit per run; at 100 TB that is millions of
        files whose open/seek overhead dominates scan time. Compaction
        rewrites ONLY files below `small_file_bytes` (default
        target/2), keeps already-right-sized files by reference, and
        commits the result as a normal snapshot — time travel to the
        pre-compaction file set still works until expire_snapshots().

        `sort_by`: optional clustering rewrite (Iceberg sort-order /
        z-order analog) — range-partition + sort the rewritten rows on
        these columns (e.g. the Morton cell key) so min/max file stats
        become selective and read_pruned() prunes tightly.

        Partitioned (base_path) snapshots rewrite the FULL file set
        with partition columns materialized as data columns: Spark's
        basePath reader cannot mix files inside and outside one layout
        root, so keep-by-reference is only sound for flat layouts.
        """
        snap = self.current_snapshot()
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        small_file_bytes = (
            target_file_bytes // 2 if small_file_bytes is None else small_file_bytes
        )
        base_path = snap.get("base_path")
        if base_path:
            rewrite = list(snap["files"])
            keep = []
        else:
            rewrite = [f for f in snap["files"] if f["bytes"] < small_file_bytes]
            keep = [f for f in snap["files"] if f["bytes"] >= small_file_bytes]
        if not rewrite or (len(rewrite) < 2 and not sort_by):
            return {"rewritten": 0, "kept": len(snap["files"]), "new": 0,
                    "snapshot_id": snap["snapshot_id"]}
        df = self._reader(spark, [f["path"] for f in rewrite], base_path)
        total = sum(f["bytes"] for f in rewrite)
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        if sort_by:
            df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n_out) if n_out < len(rewrite) else df
        data_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.parquet(data_dir)
        new_files = self._file_stats(
            spark, self._collect_files(data_dir), stat_cols
        )
        # kept files carry their stats from the snapshot that wrote
        # them — no second stats job over data that didn't move.
        out = self._write_snapshot(
            df.schema.jsonValue(),
            [dict(f) for f in keep] + new_files,
            "overwrite",
            snap.get("properties") or None,
        )
        return {
            "rewritten": len(rewrite),
            "kept": len(keep),
            "new": len(new_files),
            "snapshot_id": out["snapshot_id"],
        }

    def upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        stat_cols: list[str] | None = None,
    ) -> dict:
        """MERGE by key (Iceberg copy-on-write MERGE INTO): rows whose
        key matches an update row are replaced, unmatched update rows
        are inserted, everything else is untouched.

        Scale shape: the manifest's per-file min/max stats on the
        FIRST key column prune the rewrite set — a file whose key
        range cannot overlap the updates' overall [min, max] is
        carried into the new snapshot BY REFERENCE (no read, no
        write). Only overlapping files are read, anti-joined against
        the (broadcastable) update keys, and rewritten alongside the
        update rows. At 100 TB with keys clustered by commit order
        (or after compact(sort_by=keys)), a point-update batch
        rewrites a handful of files, not the table. Files without
        stats on the key column are conservatively rewritten.

        Pass `stat_cols` (defaulting to key_cols) so the NEW files get
        key stats and stay prunable for the next upsert. Partitioned
        (base_path) snapshots rewrite the full file set — same
        basePath-mixing constraint as compact()."""
        snap = self.current_snapshot()
        if snap is None or not snap["files"]:
            # empty table: an upsert is just the first commit
            out = self.commit(
                spark, updates, "overwrite", stat_cols=stat_cols or key_cols
            )
            return {
                "rewritten": 0,
                "kept": 0,
                "inserted_snapshot": out["snapshot_id"],
                "snapshot_id": out["snapshot_id"],
            }
        stat_cols = stat_cols or key_cols
        base_path = snap.get("base_path")
        k0 = key_cols[0]
        if base_path:
            rewrite, keep = list(snap["files"]), []
        else:
            from pyspark.sql import functions as F

            b = updates.agg(
                F.min(k0).alias("lo"), F.max(k0).alias("hi")
            ).collect()[0]
            lo, hi = b["lo"], b["hi"]
            rewrite, keep = [], []
            for f in snap["files"]:
                st = f.get("stats") or {}
                fmin, fmax = st.get(f"min_{k0}"), st.get(f"max_{k0}")
                overlaps = (
                    fmin is None
                    or fmax is None
                    or lo is None
                    or not (fmax < lo or fmin > hi)
                )
                (rewrite if overlaps else keep).append(f)
        if rewrite:
            old = self._reader(spark, [f["path"] for f in rewrite], base_path)
            survivors = old.join(
                updates.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            new_data = survivors.unionByName(updates.select(*old.columns))
        else:
            new_data = updates
        data_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        new_data.write.parquet(data_dir)
        new_files = self._file_stats(
            spark, self._collect_files(data_dir), stat_cols
        )
        out = self._write_snapshot(
            new_data.schema.jsonValue(),
            [dict(f) for f in keep] + new_files,
            "overwrite",
            snap.get("properties") or None,
        )
        return {
            "rewritten": len(rewrite),
            "kept": len(keep),
            "new": len(new_files),
            "snapshot_id": out["snapshot_id"],
        }

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

    # -- bloom point-lookup index --------------------------------------------

    BLOOM_BITS = 65536
    BLOOM_HASHES = 4

    def add_blooms(self, spark: SparkSession, cols: list[str],
                   bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES) -> dict:
        """Attach a per-file Bloom filter on each of `cols` to the
        CURRENT snapshot (committed as a new snapshot with the same
        file set — manifests stay immutable), enabling point-lookup
        file skipping beyond min/max range pruning: a high-cardinality
        key scattered across files defeats min/max, but its bloom
        prunes to ~one file + false positives.

        Bit positions are pmod(xxhash64(value, seed), bits) for
        seeds 0..hashes-1 — computed by the JVM in ONE scan of the
        file set grouped by input_file_name (never a per-file driver
        loop), and recomputed identically (also JVM-side) at lookup,
        so there is no cross-language hash-parity risk.
        """
        import base64

        from pyspark.sql import functions as F

        snap = self.current_snapshot()
        files = [dict(f) for f in snap["files"]]
        reader = self._reader(
            spark, [f["path"] for f in files], snap.get("base_path")
        )
        for col in cols:
            pos = F.explode(F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(bits))
                for i in range(hashes)
            ])).alias("pos")
            rows = (
                reader.select(F.input_file_name().alias("_file"), pos)
                .groupBy("_file")
                .agg(F.collect_set("pos").alias("ps"))
                .collect()
            )
            from urllib.parse import unquote, urlparse

            by_path = {
                os.path.abspath(unquote(urlparse(r["_file"]).path)): r["ps"]
                for r in rows
            }
            for f in files:
                ps = by_path.get(os.path.abspath(f["path"]), [])
                bm = bytearray(bits // 8)
                for p in ps:
                    bm[p >> 3] |= 1 << (p & 7)
                f.setdefault("blooms", {})[col] = {
                    "bits": bits,
                    "hashes": hashes,
                    "bitmap": base64.b64encode(bytes(bm)).decode(),
                }
        return self._write_snapshot(
            snap["schema"], files, "overwrite", snap.get("properties"),
            snap.get("base_path"),
        )

    def _col_type(self, col: str) -> str | None:
        """The column's type string from the current snapshot schema."""
        snap = self.current_snapshot()
        for f in (snap.get("schema") or {}).get("fields", []):
            if f["name"] == col and isinstance(f["type"], str):
                return f["type"]
        return None

    def _lookup_positions(self, spark: SparkSession, col: str, value,
                          bits: int, hashes: int) -> list[int]:
        """The value's bloom bit positions, computed by the SAME JVM
        hash used at build time (one 1-row local job — not a scan).
        The literal is CAST to the column's schema type first:
        xxhash64 is type-sensitive (an int literal and a bigint column
        hash differently), and a mismatch would be a silent false
        negative."""
        from pyspark.sql import functions as F

        lit = F.lit(value)
        ctype = self._col_type(col)
        if ctype:
            lit = lit.cast(ctype)
        row = spark.range(1).select(*[
            F.pmod(F.xxhash64(lit, F.lit(i)), F.lit(bits)).alias(f"p{i}")
            for i in range(hashes)
        ]).collect()[0]
        return [row[f"p{i}"] for i in range(hashes)]

    def lookup_files(self, spark: SparkSession, col: str, value) -> list[str]:
        """Candidate files for `col = value` under the current
        snapshot's blooms: a file survives iff ALL of the value's bit
        positions are set (or it carries no bloom — never skip
        unindexed data)."""
        import base64

        snap = self.current_snapshot()
        keep = []
        pos_cache: dict[tuple[int, int], list[int]] = {}
        for f in snap["files"]:
            b = (f.get("blooms") or {}).get(col)
            if not b:
                keep.append(f["path"])
                continue
            key = (b["bits"], b["hashes"])
            if key not in pos_cache:
                pos_cache[key] = self._lookup_positions(
                    spark, col, value, b["bits"], b["hashes"]
                )
            bm = base64.b64decode(b["bitmap"])
            if all(bm[p >> 3] & (1 << (p & 7)) for p in pos_cache[key]):
                keep.append(f["path"])
        return keep

    def read_lookup(self, spark: SparkSession, col: str, value) -> DataFrame:
        """Point lookup `col = value` reading only bloom-surviving
        files (plus the exact filter — blooms admit false positives,
        never false negatives)."""
        from pyspark.sql import functions as F

        keep = self.lookup_files(spark, col, value)
        if not keep:
            return self.read(spark).limit(0)
        snap = self.current_snapshot()
        return self._reader(spark, keep, snap.get("base_path")).filter(
            F.col(col) == F.lit(value)
        )
