"""Snapshot lifecycle on the Iceberg-style table: time travel,
changelog (incremental) reads, rollback, and snapshot expiry — the
table-maintenance surface a resumable 100-TB pipeline needs beyond
commit/read (Iceberg VERSION AS OF / incremental scan /
rollback_to_snapshot / expire_snapshots parity)."""

import os

import pytest

from geo_import_spark.plans.table import Table


@pytest.fixture
def seeded(spark, tmp_path):
    """Table with: snap 0 = ids 0..4 (create), snap 1 = +ids 100..101
    (append)."""
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.range(5), stat_cols=["id"])
    t.commit(
        spark,
        spark.range(100, 102),
        mode="append",
        stat_cols=["id"],
    )
    return t


def test_time_travel_read(spark, seeded):
    t = seeded
    assert t.read(spark).count() == 7
    assert sorted(r["id"] for r in t.read(spark, snapshot_id=0).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_snapshot_log_kinds(spark, seeded):
    t = seeded
    t.commit(spark, spark.range(3))  # overwrite
    log = t.snapshot_log()
    assert [e["kind"] for e in log] == ["create", "append", "overwrite"]
    assert [e["snapshot_id"] for e in log] == [0, 1, 2]
    assert log[1]["parent_id"] == 0 and log[1]["rows"] == 7


def test_incremental_read_returns_only_the_delta(spark, seeded):
    t = seeded
    delta = t.read_incremental(spark, from_snapshot_id=0)
    assert sorted(r["id"] for r in delta.collect()) == [100, 101]
    # from == to -> empty delta with the table schema
    assert t.read_incremental(spark, 1, 1).count() == 0


def test_incremental_read_rejects_overwrite_in_range(spark, seeded):
    t = seeded
    t.commit(spark, spark.range(3))  # overwrite at snap 2
    with pytest.raises(ValueError, match="overwrite"):
        t.read_incremental(spark, from_snapshot_id=0)
    # but the pre-overwrite range is still readable
    assert t.read_incremental(spark, 0, 1).count() == 2


def test_rollback_then_commit_never_reuses_ids(spark, seeded):
    t = seeded
    t.rollback(0)
    assert t.read(spark).count() == 5
    snap = t.commit(spark, spark.range(10, 13), mode="append")
    # id allocation is monotonic over ALL history, parent is the
    # rolled-back snapshot
    assert snap["snapshot_id"] == 2 and snap["parent_id"] == 0
    assert sorted(r["id"] for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 10, 11, 12,
    ]
    # snap 1's manifest still exists as history
    assert t.snapshot(1)["rows"] == 7


def test_expire_snapshots_gcs_unreferenced_files(spark, seeded):
    t = seeded
    t.commit(spark, spark.range(3))  # overwrite: snaps 0/1 files now dead
    live = {f["path"] for f in t.current_snapshot()["files"]}
    res = t.expire_snapshots(keep_last=1)
    assert res["removed_files"] > 0
    assert t.snapshots() == ["snapshot-000002.json"]
    for p in live:
        assert os.path.exists(p)
    assert t.read(spark).count() == 3
    # expired snapshots are gone
    with pytest.raises(FileNotFoundError):
        t.snapshot(0)


def test_expire_keeps_files_shared_with_live_snapshots(spark, seeded):
    """Append-mode history: old manifests reference the SAME files the
    live snapshot does — expiry must not delete them."""
    t = seeded
    t.expire_snapshots(keep_last=1)  # drops snap 0's manifest only
    assert t.snapshots() == ["snapshot-000001.json"]
    assert t.read(spark).count() == 7  # snap 0's files survive (shared)


def test_append_rejects_schema_mismatch(spark, tmp_path):
    """A mismatched append would poison every later scan of the mixed
    file set (Parquet type error at read time) — commit must fail
    instead, Iceberg-style."""
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.range(3))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.commit(
            spark,
            spark.createDataFrame([("x",)], "id string"),
            mode="append",
        )
    # failed commit left no new snapshot; table still readable
    assert len(t.snapshots()) == 1
    assert t.read(spark).count() == 3
    # same schema still appends fine
    t.commit(spark, spark.range(10, 12), mode="append")
    assert t.read(spark).count() == 5


def test_replace_with_changed_schema_drops_old_columns(spark, tmp_path):
    """Reference replace-flow parity (es6-lib/services/spatial.js:128-173
    copySchema): replacing a layer deletes the old columns — the new
    schema wins outright, old columns are dropped, never merged. Here
    an overwrite commit with a different schema must leave readers
    seeing ONLY the new columns, and time travel must still serve the
    old schema for the old snapshot."""
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.createDataFrame([(1, "a")], "id int, old_col string"))
    t.commit(
        spark,
        spark.createDataFrame([(2, 3.5)], "id int, new_col double"),
        mode="overwrite",
    )
    cur = t.read(spark)
    assert cur.columns == ["id", "new_col"]  # old_col gone, not merged
    assert [r["id"] for r in cur.collect()] == [2]
    # manifest schema matches the replacement exactly
    names = [f["name"] for f in t.current_snapshot()["schema"]["fields"]]
    assert names == ["id", "new_col"]
    # time travel to the pre-replace snapshot still serves the old shape
    assert t.read(spark, snapshot_id=0).columns == ["id", "old_col"]


def test_compact_binpacks_small_files_and_preserves_data(spark, tmp_path):
    """Many small appends -> compact -> same rows, fewer files,
    right-sized files kept by reference, history intact."""
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.range(10).repartition(5), stat_cols=["id"])
    t.commit(
        spark, spark.range(10, 20).repartition(5), mode="append", stat_cols=["id"]
    )
    pre = t.current_snapshot()
    n_pre = len(pre["files"])
    assert n_pre >= 4  # empty partitions write no file; several remain
    res = t.compact(spark, target_file_bytes=1 << 20, stat_cols=["id"])
    assert res["rewritten"] == n_pre and res["new"] == 1
    post = t.current_snapshot()
    assert len(post["files"]) == 1
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(20))
    # time travel to the pre-compaction snapshot still works
    assert t.read(spark, snapshot_id=pre["snapshot_id"]).count() == 20
    # stats were recomputed for the new file (read_pruned works)
    assert t.read_pruned(spark, "id", 100, 200).count() == 0
    assert t.read_pruned(spark, "id", 0, 5).count() == 20  # one file = no pruning
    # expire now GCs the dead small files
    gone = {f["path"] for f in pre["files"]}
    t.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in gone)


def test_compact_keeps_large_files_by_reference(spark, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.range(1000).coalesce(1), stat_cols=["id"])
    big = t.current_snapshot()["files"][0]["path"]
    for lo in (2000, 3000, 4000):
        t.commit(
            spark,
            spark.range(lo, lo + 5).coalesce(1),
            mode="append",
            stat_cols=["id"],
        )
    # threshold between the small-append size and the big file's size
    small = t.current_snapshot()["files"][-1]["bytes"]
    res = t.compact(
        spark, target_file_bytes=4 << 20, small_file_bytes=small + 512,
        stat_cols=["id"],
    )
    assert res["kept"] == 1 and res["rewritten"] == 3 and res["new"] == 1
    post = t.current_snapshot()
    assert big in {f["path"] for f in post["files"]}  # untouched, by reference
    # kept file retained its stats without a recompute
    kept = next(f for f in post["files"] if f["path"] == big)
    assert kept["stats"]["min_id"] == 0 and kept["stats"]["max_id"] == 999
    assert t.read(spark).count() == 1015


def test_compact_sort_by_clusters_for_pruning(spark, tmp_path):
    """sort_by rewrite = Iceberg sort-order rewrite: after clustering
    on id, file min/max ranges are disjoint and read_pruned prunes."""
    from pyspark.sql import functions as F

    t = Table(str(tmp_path / "tbl"))
    # round-robin repartition -> interleaved ids across files -> no
    # file is prunable on id
    df = spark.range(4000).repartition(8)
    t.commit(spark, df, stat_cols=["id"])
    assert len(t.current_snapshot()["files"]) == 8
    total = sum(f["bytes"] for f in t.current_snapshot()["files"])
    t.compact(
        spark,
        target_file_bytes=max(1, total // 4),
        small_file_bytes=1 << 30,
        sort_by=["id"],
        stat_cols=["id"],
    )
    files = t.current_snapshot()["files"]
    assert len(files) >= 2
    # disjoint id ranges across files
    spans = sorted((f["stats"]["min_id"], f["stats"]["max_id"]) for f in files)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo
    # pruning now reads a strict subset of files (file granularity;
    # the caller's predicate finishes the job)
    pruned = t.read_pruned(spark, "id", 0, 10)
    assert 0 < pruned.count() < 4000
    assert pruned.filter("id <= 10").count() == 11
    assert len(pruned.inputFiles()) < len(files)


def test_compact_rewrites_partitioned_snapshot_fully(spark, tmp_path):
    """base_path (Hive-layout) snapshots can't mix kept+new files under
    one basePath -> compact rewrites the whole set, materializing the
    partition column; data and schema survive."""
    from pyspark.sql import functions as F

    lay = str(tmp_path / "layout")
    spark.range(100).withColumn("unit", F.col("id") % 4).write.partitionBy(
        "unit"
    ).parquet(lay)
    paths = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(lay)
        for n in ns
        if n.endswith(".parquet")
    ]
    t = Table(str(tmp_path / "tbl"))
    t.commit_files(spark, paths, base_path=lay, stat_cols=["id"])
    res = t.compact(spark, target_file_bytes=8 << 20, stat_cols=["id"])
    assert res["kept"] == 0 and res["rewritten"] == len(paths)
    post = t.current_snapshot()
    assert "base_path" not in post
    got = t.read(spark)
    assert set(got.columns) == {"id", "unit"}
    assert got.count() == 100
    assert got.agg(F.countDistinct("unit")).collect()[0][0] == 4


def test_expire_never_touches_external_checkpoint_files(spark, tmp_path):
    """commit_files() by-reference snapshots point at checkpoint
    parquet OUTSIDE the table's data/ dir; expiry must leave them."""
    ext = str(tmp_path / "ckpt")
    spark.range(4).coalesce(1).write.parquet(ext)
    paths = [
        os.path.join(ext, n) for n in os.listdir(ext) if n.endswith(".parquet")
    ]
    t = Table(str(tmp_path / "tbl"))
    t.commit_files(spark, paths)
    t.commit(spark, spark.range(2))  # overwrite
    t.expire_snapshots(keep_last=1)
    for p in paths:
        assert os.path.exists(p)
