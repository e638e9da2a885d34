"""Incremental continuous-aggregate maintenance: stored density agg +
changelog delta agg == full recompute, exactly."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import tiling
from geo_import_spark.plans.table import Table


def test_incremental_density_equals_recompute(spark, sf_dir, tmp_path):
    pts = corpus.points(spark, sf_dir).select("doc_id", "lon", "lat")
    batch1 = pts.filter(F.crc32(F.col("doc_id")) % 3 != 0)
    batch2 = pts.filter(F.crc32(F.col("doc_id")) % 3 == 0)

    t = Table(str(tmp_path / "pts_table"))
    s0 = t.commit(spark, batch1, mode="overwrite")["snapshot_id"]
    stored = tiling.grid_density(t.read(spark), level=5)

    t.commit(spark, batch2, mode="append")
    delta = t.read_incremental(spark, from_snapshot_id=s0)
    assert delta.count() == batch2.count()

    merged = tiling.merge_density(
        stored, tiling.grid_density(delta, level=5)
    ).toPandas().set_index("cell_id").sort_index()
    full = tiling.grid_density(t.read(spark), level=5) \
        .toPandas().set_index("cell_id").sort_index()
    assert merged.equals(full)


def test_merge_density_empty_delta_is_identity(spark, sf_dir):
    pts = corpus.points(spark, sf_dir).select("doc_id", "lon", "lat")
    agg = tiling.grid_density(pts, level=5)
    empty = tiling.grid_density(pts.limit(0), level=5)
    merged = tiling.merge_density(agg, empty).toPandas() \
        .set_index("cell_id").sort_index()
    base = agg.toPandas().set_index("cell_id").sort_index()
    assert merged.equals(base)
