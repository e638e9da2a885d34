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
    assert all(
        v["units_run"] == 0 for k, v in s2.items() if k != "publish"
    )
    # publish is idempotent re-commit: same bbox, new snapshot
    assert s2["publish"]["bbox"] == s["publish"]["bbox"]


def test_pipeline_publishes_bbox_and_errors(spark, tmp_path):
    """Stage 4: the committed output manifest carries the WGS84
    mega-bbox, and rejected rows land in the errors table with a
    reason (spatial.js:318-345 + ISS error events)."""
    from geo_import_spark.functions import geomkern
    from geo_import_spark.plans.table import Table
    from geo_import_spark.sources.geojson import GEOM_TYPE
    from pyspark.sql import types as T

    feat = (
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[%s,%s]},'
        '"properties":{}}'
    )
    docs = spark.createDataFrame(
        [
            ("d1", [("geometry", feat % (10.0, 20.0), "", 0)]),
            ("d2", [("geometry", feat % (-30.0, 5.0), "", 0)]),
            ("d3", [("geometry", "{not json", "", 0)]),
            (
                "d4",
                [
                    (
                        "geometry",
                        '{"type":"Feature","geometry":{"type":"Point",'
                        '"coordinates":[1.0,2.0,3.0]},"properties":{}}',
                        "",
                        0,
                    )
                ],
            ),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    ring = [[0.0, 0.0], [40.0, 0.0], [40.0, 40.0], [0.0, 40.0], [0.0, 0.0]]
    po, ro, xs, ys = geomkern.flatten_geojson_coords("Polygon", [ring])
    polys = spark.createDataFrame(
        [("p1", ("Polygon", po, ro, xs, ys))],
        T.StructType(
            [T.StructField("poly_id", T.StringType()), T.StructField("geom", GEOM_TYPE)]
        ),
    )
    out = str(tmp_path / "pub")
    s = pl.run_pipeline(spark, "synthetic", out, docs_df=docs, polys_df=polys)
    snap = Table(f"{out}/table_pip").current_snapshot()
    assert snap["properties"]["bboxCrs"] == "EPSG:4326"
    assert snap["properties"]["bbox"] == {
        "minx": -30.0, "miny": 5.0, "maxx": 10.0, "maxy": 20.0
    }
    errs = Table(f"{out}/table_errors").read(spark).toPandas()
    assert sorted(errs["doc_id"]) == ["d3", "d4"]
    reasons = " ".join(errs["error"])
    assert "malformed" in reasons and "arity" in reasons
    assert s["publish"]["error_rows"] == 2
    # parent metadata lists the child tables (spatial.js:318-345
    # geo.layers / privateMetadata.childViews parity)
    assert snap["properties"]["layers"] == ["table_pip"]
    assert snap["properties"]["childViews"] == ["table_pip", "table_errors"]


def test_publish_commits_by_reference_not_rewrite(spark, sf_dir, tmp_path):
    """VERDICT r2 #3: publish must snapshot the checkpoint's parquet
    files into the manifest, not write a second copy of the data."""
    import glob
    import os

    from geo_import_spark.plans.table import Table

    out = str(tmp_path / "run")
    pl.run_pipeline(spark, sf_dir, out)
    tbl = Table(f"{out}/table_pip")
    # no data files were copied under the table's own data dir
    copied = glob.glob(f"{out}/table_pip/data/**/*.parquet", recursive=True)
    assert copied == []
    # every manifest file points into the pip checkpoint dir
    snap = tbl.current_snapshot()
    stage_dir = os.path.join(out, "pip")
    assert snap["files"] and all(
        f["path"].startswith(stage_dir) for f in snap["files"]
    )
    # reading the published table equals reading the checkpoint stage
    got = tbl.read(spark)
    direct = CheckpointedStage(out, "pip").read(spark)
    assert got.count() == direct.count() == snap["rows"] > 0
    assert set(got.columns) == set(direct.columns)  # unit col survives
