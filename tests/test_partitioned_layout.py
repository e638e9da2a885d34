"""Cell-partitioned layout: planning-time pruning is physical (fewer
files read), visible in the plan, and result-identical."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.plans import partitioned


def _write(spark, sf_dir, tmp_path):
    path = str(tmp_path / "pts_by_cell")
    partitioned.write_cell_partitioned(
        corpus.points(spark, sf_dir), path
    )
    return path


def test_pruned_read_touches_fewer_files(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    full = spark.read.parquet(path)
    some = partitioned.read_cells(spark, path, ["3_3", "4_4"])
    n_full = partitioned.files_read(full)
    n_some = partitioned.files_read(some)
    assert 0 < n_some < n_full


def test_partition_filters_in_plan(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    plan = (
        partitioned.read_cells(spark, path, ["3_3"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "pcell" in plan.split("PartitionFilters", 1)[1][:200], (
        "the cell filter must prune at the partition level, "
        "not as a row-level PushedFilter"
    )


def test_pruned_read_equals_unpartitioned_filter(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    cells = ["3_3", "4_4", "0_7"]
    got = sorted(
        r["doc_id"]
        for r in partitioned.read_cells(spark, path, cells).collect()
    )
    exp = sorted(
        r["doc_id"]
        for r in corpus.points(spark, sf_dir)
        .withColumn("pcell", partitioned.cell_key())
        .filter(F.col("pcell").isin(cells))
        .collect()
    )
    assert got == exp and got
