"""Copy-on-write MERGE (Table.upsert): matched keys replaced,
unmatched update rows inserted, and — the scale property — files whose
key range cannot overlap the update batch are carried into the new
snapshot by reference, never read or rewritten."""

from pyspark.sql import functions as F

from geo_import_spark.plans.table import Table


def _rows(spark, t):
    return {
        (r["id"], r["v"])
        for r in t.read(spark).select("id", "v").collect()
    }


def test_upsert_replaces_matched_and_inserts_new(spark, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    base = spark.range(5).select("id", F.lit("old").alias("v"))
    t.commit(spark, base, stat_cols=["id"])
    updates = spark.createDataFrame(
        [(2, "new"), (4, "new"), (100, "new")], ["id", "v"]
    )
    t.upsert(spark, updates, key_cols=["id"])
    assert _rows(spark, t) == {
        (0, "old"), (1, "old"), (3, "old"),
        (2, "new"), (4, "new"), (100, "new"),
    }


def test_upsert_prunes_nonoverlapping_files_by_reference(spark, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    # two files with disjoint id ranges via two appends of 1-file sets
    lo = spark.range(0, 10).coalesce(1).select("id", F.lit("lo").alias("v"))
    hi = spark.range(1000, 1010).coalesce(1).select("id", F.lit("hi").alias("v"))
    t.commit(spark, lo, stat_cols=["id"])
    t.commit(spark, hi, mode="append", stat_cols=["id"])
    before = {f["path"] for f in t.current_snapshot()["files"]}
    lo_paths = {
        f["path"]
        for f in t.current_snapshot()["files"]
        if f["stats"]["max_id"] < 1000
    }
    assert lo_paths and lo_paths < before

    updates = spark.createDataFrame([(1005, "new")], ["id", "v"])
    res = t.upsert(spark, updates, key_cols=["id"])
    after = {f["path"] for f in t.current_snapshot()["files"]}
    # the lo file survives verbatim (by reference), the hi file is gone
    assert lo_paths < after
    assert res["kept"] == len(lo_paths)
    assert res["rewritten"] == len(before) - len(lo_paths)
    assert _rows(spark, t) == (
        {(i, "lo") for i in range(10)}
        | {(i, "hi") for i in range(1000, 1010) if i != 1005}
        | {(1005, "new")}
    )


def test_upsert_on_empty_table_is_create(spark, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    updates = spark.createDataFrame([(1, "a")], ["id", "v"])
    t.upsert(spark, updates, key_cols=["id"])
    assert _rows(spark, t) == {(1, "a")}


def test_upsert_keeps_time_travel(spark, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    t.commit(
        spark,
        spark.range(3).select("id", F.lit("old").alias("v")),
        stat_cols=["id"],
    )
    first = t.current_snapshot()["snapshot_id"]
    t.upsert(
        spark,
        spark.createDataFrame([(0, "new")], ["id", "v"]),
        key_cols=["id"],
    )
    old = {
        (r["id"], r["v"])
        for r in t.read(spark, snapshot_id=first).collect()
    }
    assert old == {(0, "old"), (1, "old"), (2, "old")}
    assert (0, "new") in _rows(spark, t)


def test_replace_with_changed_schema_drops_old_columns(spark, tmp_path):
    """Reference replace-flow parity (spatial.js copySchema): replacing
    a dataset with a different schema DROPS the old columns — the new
    snapshot's schema is exactly the new frame's, never a merge — while
    time travel still reads the old shape from the old snapshot."""
    t = Table(str(tmp_path / "tbl"))
    v1 = spark.range(3).select("id", F.lit("x").alias("old_col"))
    s1 = t.commit(spark, v1)
    v2 = spark.range(4).select("id", (F.col("id") * 2).alias("new_col"))
    t.commit(spark, v2, mode="overwrite")

    cur = t.read(spark)
    assert cur.columns == ["id", "new_col"]
    assert cur.count() == 4
    # the replaced column is genuinely gone, not nulled
    assert "old_col" not in {f.name for f in cur.schema.fields}
    # the log shows a replace, and time travel resurrects the old shape
    assert t.snapshot_log()[-1]["kind"] == "overwrite"
    old = t.read(spark, snapshot_id=s1["snapshot_id"])
    assert old.columns == ["id", "old_col"]
    assert old.count() == 3
