"""geom_stats: planar shoelace area / perimeter / centroid over the
flat geometry layout — pure JVM array math (no UDF, no shuffle)."""

import math

import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import geomstats


def _geom_row(spark, ring_offsets, xs, ys, poly_id="p"):
    return spark.createDataFrame(
        [(poly_id, (ring_offsets, xs, ys))],
        "poly_id string, geom struct<ring_offsets: array<int>, xs: array<double>, ys: array<double>>",
    )


def test_rectangle_area_perimeter_centroid(spark):
    # CCW closed 2x3 rectangle at origin offset (1, 2)
    df = _geom_row(
        spark,
        [0, 5],
        [1.0, 3.0, 3.0, 1.0, 1.0],
        [2.0, 2.0, 5.0, 5.0, 2.0],
    )
    r = geomstats.geom_stats(df).collect()[0]
    assert r["n_rings"] == 1 and r["n_vertices"] == 5
    assert r["area"] == pytest.approx(6.0)
    assert r["perimeter"] == pytest.approx(10.0)
    assert r["cx"] == pytest.approx(2.0)
    assert r["cy"] == pytest.approx(3.5)


def test_winding_direction_does_not_change_area_sign(spark):
    cw = _geom_row(
        spark,
        [0, 5],
        [1.0, 1.0, 3.0, 3.0, 1.0],
        [2.0, 5.0, 5.0, 2.0, 2.0],
    )
    r = geomstats.geom_stats(cw).collect()[0]
    assert r["area"] == pytest.approx(6.0)
    assert r["cx"] == pytest.approx(2.0) and r["cy"] == pytest.approx(3.5)


def test_donut_hole_subtracts_area_and_ring_mask_skips_bridge_segment(spark):
    # 10x10 shell (CCW) with 2x2 hole (CW): area 100 - 4 = 96.
    # The segment from the shell's last vertex to the hole's first
    # vertex must be masked out (ring boundary), not treated as an edge.
    shell_x = [0.0, 10.0, 10.0, 0.0, 0.0]
    shell_y = [0.0, 0.0, 10.0, 10.0, 0.0]
    hole_x = [4.0, 4.0, 6.0, 6.0, 4.0]
    hole_y = [4.0, 6.0, 6.0, 4.0, 4.0]
    df = _geom_row(spark, [0, 5, 10], shell_x + hole_x, shell_y + hole_y)
    r = geomstats.geom_stats(df).collect()[0]
    assert r["n_rings"] == 2 and r["n_vertices"] == 10
    assert r["area"] == pytest.approx(96.0)
    assert r["perimeter"] == pytest.approx(40.0 + 8.0)
    # symmetric figure: centroid stays at the shell center
    assert r["cx"] == pytest.approx(5.0) and r["cy"] == pytest.approx(5.0)


def test_l_shape_area_matches_rect_decomposition(spark, sf_dir):
    from geo_import_spark import corpus

    lp = corpus.concave_polygons(spark, sf_dir)
    got = {r["poly_id"]: r for r in geomstats.geom_stats(lp).collect()}
    exp = lp.select(
        "poly_id",
        ((F.col("x1") - F.col("x0")) * (F.col("ym") - F.col("y0"))
         + (F.col("xm") - F.col("x0")) * (F.col("y1") - F.col("ym"))).alias("area"),
    ).collect()
    assert len(exp) > 0
    for e in exp:
        assert got[e["poly_id"]]["area"] == pytest.approx(e["area"], rel=1e-12)


def test_empty_and_degenerate_geometries_yield_nulls(spark):
    empty = _geom_row(spark, [0], [], [], poly_id="empty")
    line = _geom_row(
        spark, [0, 3], [0.0, 4.0, 0.0], [0.0, 0.0, 0.0], poly_id="line"
    )
    rows = {r["poly_id"]: r for r in geomstats.geom_stats(empty.unionByName(line)).collect()}
    e = rows["empty"]
    assert e["n_vertices"] == 0 and e["area"] is None and e["cx"] is None
    l = rows["line"]  # zero-area: perimeter real, centroid undefined
    assert l["area"] == pytest.approx(0.0)
    assert l["perimeter"] == pytest.approx(8.0)
    assert l["cx"] is None and l["cy"] is None


def test_geom_stats_plan_is_jvm_only(spark):
    df = _geom_row(spark, [0, 5], [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0])
    plan = geomstats.geom_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_grid_density_counts_match_bruteforce_and_plan_is_jvm(spark, sf_dir):
    import numpy as np

    from geo_import_spark import corpus
    from geo_import_spark.functions import cells as cellmod
    from geo_import_spark.operators import tiling
    from geo_import_spark.sources import geojson

    pts = geojson.point_spans(corpus.documents(spark, sf_dir))
    got = {r["cell_id"]: r for r in tiling.grid_density(pts, level=6).collect()}
    pdf = pts.select("lon", "lat").toPandas()
    cells = cellmod.cell_encode(pdf["lon"].values, pdf["lat"].values, 6)
    uniq, counts = np.unique(cells, return_counts=True)
    assert {int(c): int(n) for c, n in zip(uniq, counts)} == {
        c: r["n_points"] for c, r in got.items()
    }
    # every point's cell bounds actually contain it
    lo0, la0, lo1, la1 = cellmod.cell_bounds(uniq)
    for c, a, b, d, e in zip(uniq.tolist(), lo0, la0, lo1, la1):
        r = got[c]
        assert (r["lon_min"], r["lat_min"], r["lon_max"], r["lat_max"]) == (a, b, d, e)
    plan = tiling.grid_density(pts, level=6)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_ring_perimeter_multi_ring_skips_boundary_edges(spark):
    """A holed polygon (shell + inner ring) must sum each ring's own
    edges and NOT the phantom edge from the shell's last vertex to the
    hole's first (the ring_offsets guard)."""
    from pyspark.sql import functions as F

    from geo_import_spark.operators import geomops

    geom = F.struct(
        F.lit("Polygon").alias("gtype"),
        F.array(F.lit(0), F.lit(2)).alias("part_offsets"),
        F.array(F.lit(0), F.lit(5), F.lit(10)).alias("ring_offsets"),
        # shell 10x10, hole 2x2 => perimeters 40 + 8
        F.array(*[F.lit(float(v)) for v in [0, 10, 10, 0, 0, 4, 6, 6, 4, 4]]).alias("xs"),
        F.array(*[F.lit(float(v)) for v in [0, 0, 10, 10, 0, 4, 4, 6, 6, 4]]).alias("ys"),
    )
    df = spark.range(1).select(F.lit("p0").alias("poly_id"), geom.alias("geom"))
    row = geomops.ring_perimeter(df).collect()[0]
    assert row["n_vertices"] == 10
    assert row["perimeter_deg"] == 48.0


def test_zonal_stats_matches_brute_force(spark, sf_dir):
    """zonal_stats equals the per-zone aggregate of a brute-force
    bbox containment pass."""
    import json

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from geo_import_spark import corpus

    got = {
        r["poly_id"]: (r["n_points"], r["sum_val"], r["min_val"],
                       r["max_val"], r["mean_val"])
        for r in entrymod.queries()["zonal_stats"](spark, sf_dir).collect()
    }
    pts = [
        (r["lon"], r["lat"], int(json.loads(r["properties"])["a_num"]))
        for r in entrymod._parse_points(spark, sf_dir).collect()
    ]
    polys = corpus.polygons(spark, sf_dir).select(
        "poly_id", "minx", "miny", "maxx", "maxy"
    ).collect()
    expect = {}
    for g in polys:
        vs = [v for lon, lat, v in pts
              if g["minx"] < lon < g["maxx"] and g["miny"] < lat < g["maxy"]]
        if vs:
            expect[g["poly_id"]] = (
                len(vs), sum(vs), min(vs), max(vs), sum(vs) / len(vs)
            )
    assert got == expect
