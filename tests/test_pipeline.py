"""End-to-end checkpointed pipeline: full run, kill/restart resume,
output equivalence with the direct (non-checkpointed) operators."""

import pandas as pd
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import pip as pipmod
from geo_import_spark.plans import pipeline as pl
from geo_import_spark.plans.checkpoint import CheckpointedStage
from geo_import_spark.sources import geojson


def test_pipeline_full_run_matches_direct(spark, sf_dir, tmp_path):
    out = str(tmp_path / "run")
    s = pl.run_pipeline(spark, sf_dir, out)
    assert s["points"]["units_run"] > 0
    pip_rows = (
        CheckpointedStage(out, "pip").read(spark)
        .select("doc_id", "poly_id")
        .toPandas()
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    direct = (
        pipmod.pip_join(
            geojson.point_spans(corpus.documents(spark, sf_dir)),
            corpus.polygons(spark, sf_dir),
        )
        .select("doc_id", "poly_id")
        .toPandas()
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pip_rows, direct)
    tiles = CheckpointedStage(out, "tiles").read(spark)
    assert tiles.count() > 0
    assert len(pl.pipeline_metrics(out)) > 0


def test_pipeline_resume_after_kill(spark, sf_dir, tmp_path):
    """Simulated kill: stage 1 completes for half the units, then the
    whole pipeline runs; completed units are not reprocessed and the
    final result is identical to an uninterrupted run."""
    out = str(tmp_path / "run")
    docs = corpus.documents(spark, sf_dir)
    pts = geojson.point_spans(docs).withColumn("unit", pl._unit_col())
    units = sorted(r[0] for r in pts.select("unit").distinct().collect())
    half = units[: len(units) // 2]
    st = CheckpointedStage(out, "points")
    st.run(spark, pts.filter(F.col("unit").isin(half)), "unit", lambda df: df)
    assert len(st.completed_units()) == len(half)

    s = pl.run_pipeline(spark, sf_dir, out)
    assert s["points"]["units_skipped"] == len(half)
    assert s["points"]["units_run"] == len(units) - len(half)
    # resumed output complete
    assert CheckpointedStage(out, "points").read(spark).count() == pts.count()
    # a second full run is a no-op everywhere
    s2 = pl.run_pipeline(spark, sf_dir, out)
    assert all(v["units_run"] == 0 for v in s2.values())
