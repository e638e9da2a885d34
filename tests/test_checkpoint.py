"""Iceberg-style table + checkpoint/lineage/resume tests (north rule
resumability: a killed run must not reprocess completed cell groups)."""

import os

import pytest
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.plans.checkpoint import CheckpointedStage
from geo_import_spark.plans.table import Table


def test_table_commit_read_roundtrip(spark, sf_dir, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    pts = corpus.points(spark, sf_dir)
    snap = t.commit(spark, pts, stat_cols=["lon"])
    assert snap["snapshot_id"] == 0 and snap["rows"] == pts.count()
    assert t.read(spark).count() == pts.count()
    # append makes a child snapshot with both file sets
    snap2 = t.commit(spark, pts.limit(10), mode="append", stat_cols=["lon"])
    assert snap2["parent_id"] == 0
    assert t.read(spark).count() == pts.count() + 10


def test_table_commit_is_atomic(spark, sf_dir, tmp_path):
    """A snapshot written but not pointed at is invisible."""
    t = Table(str(tmp_path / "tbl"))
    pts = corpus.points(spark, sf_dir).limit(5)
    t.commit(spark, pts)
    before = t.current_snapshot()
    # simulate a crashed commit: data written, pointer never replaced
    crash_dir = os.path.join(t.root, "data", "crashed")
    pts.write.parquet(crash_dir)
    assert t.current_snapshot() == before
    assert t.read(spark).count() == 5


def test_manifest_stats_pruning(spark, sf_dir, tmp_path):
    t = Table(str(tmp_path / "tbl"))
    pts = corpus.points(spark, sf_dir)
    lo = pts.filter(F.col("lon") < 0).repartition(2)
    hi = pts.filter(F.col("lon") >= 0).repartition(2)
    t.commit(spark, lo, stat_cols=["lon"])
    t.commit(spark, hi, mode="append", stat_cols=["lon"])
    snap = t.current_snapshot()
    pruned = t.read_pruned(spark, "lon", 100.0, 180.0)
    files_read = pruned.inputFiles()
    assert 0 < len(files_read) < len(snap["files"])  # pruning really cut files
    assert pruned.filter(F.col("lon") < 100.0).count() >= 0  # file-level only
    assert (
        pruned.filter(F.col("lon") >= 100).count()
        == corpus.points(spark, sf_dir).filter(F.col("lon") >= 100).count()
    )


@pytest.fixture
def unitized(spark, sf_dir):
    """Points with a coarse unit column (8 longitude bands)."""
    return corpus.points(spark, sf_dir).withColumn(
        "unit", (F.floor((F.col("lon") + 180.0) / 45.0)).cast("int")
    )


def _transform(df):
    return df.withColumn("lon2", F.col("lon") * 2)


def test_checkpoint_resume_skips_done_units(spark, unitized, tmp_path):
    stage = CheckpointedStage(str(tmp_path / "ckpt"), "double")
    # first run: only units 0-3 "survive before the kill"
    partial = unitized.filter(F.col("unit") < 4)
    s1 = stage.run(spark, partial, "unit", _transform)
    assert s1["units_run"] == 4 and s1["units_skipped"] == 0
    # restart with the full input: completed units are skipped
    s2 = stage.run(spark, unitized, "unit", _transform)
    assert s2["units_skipped"] == 4
    assert s2["units_run"] == unitized.select("unit").distinct().count() - 4
    # third run: everything cached, zero work
    s3 = stage.run(spark, unitized, "unit", _transform)
    assert s3["units_run"] == 0
    # final output equals a single-shot run
    total = stage.read(spark).count()
    assert total == unitized.count()
    # lineage records exist for every unit with row counts
    lin = {r["unit"]: r["rows"] for r in stage.lineage()}
    per_unit = dict(
        unitized.groupBy("unit").count().collect()
    )
    assert {int(k): v for k, v in lin.items()} == {
        int(k): v for k, v in per_unit.items()
    }


def test_checkpoint_partial_unit_overwritten(spark, unitized, tmp_path):
    """A unit whose files were written but whose lineage record never
    landed (kill between write and record) is re-run and overwritten,
    not duplicated."""
    stage = CheckpointedStage(str(tmp_path / "ckpt"), "double")
    one = unitized.filter(F.col("unit") == 2)
    # simulate the kill: data written directly, no lineage record
    _transform(one).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("unit").parquet(stage.stage_dir)
    assert stage.completed_units() == set()
    stage.run(spark, unitized, "unit", _transform)
    assert stage.read(spark).count() == unitized.count()  # no double rows
