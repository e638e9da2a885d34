"""Semantic tests for functions/hexgrid.py: the axial hex transform,
cube rounding, and the encode/decode inverse pair."""

import math

from pyspark.sql import functions as F

from geo_import_spark.functions import hexgrid


def test_origin_is_cell_zero(spark):
    df = spark.createDataFrame(
        [("o", 0.0, 0.0)], "doc_id string, lon double, lat double"
    )
    r = hexgrid.hex_cols(df, 8).collect()[0]
    assert (r.hq, r.hr) == (0, 0)


def test_center_roundtrip_grid(spark):
    """encode(center(q, r)) == (q, r): the cube rounding maps every
    hex center back to its own cell, across a signed coordinate grid
    and two resolutions."""
    cells = spark.range(-6, 7).selectExpr("id AS q").crossJoin(
        spark.range(-6, 7).selectExpr("id AS r")
    )
    for res in (7, 10):
        s = hexgrid.size_for_res(res)
        cx, cy = hexgrid.hex_center_exprs("q", "r", s)
        pts = cells.select(
            "q", "r",
            F.expr(cx).alias("lon"),
            F.expr(cy).alias("lat"),
        )
        bad = (
            hexgrid.hex_cols(pts, res)
            .filter("hq <> q OR hr <> r")
            .count()
        )
        assert bad == 0, res


def test_nearest_center_assignment(spark):
    """A point strictly inside a hex (offset well under the inradius
    from the center) encodes to that hex."""
    res = 8
    s = hexgrid.size_for_res(res)
    inradius = s * math.sqrt(3.0) / 2.0
    cx, cy = hexgrid.hex_center_exprs("q", "r", s)
    cells = spark.createDataFrame(
        [(3, -2), (-5, 4), (0, 0)], "q long, r long"
    )
    pts = cells.select(
        "q", "r",
        (F.expr(cx) + 0.4 * inradius).alias("lon"),
        (F.expr(cy) - 0.3 * inradius).alias("lat"),
    )
    assert hexgrid.hex_cols(pts, res).filter("hq <> q OR hr <> r").count() == 0


def test_density_counts_and_centers(spark):
    """hex_density counts points per cell and decodes the center of
    the right cell."""
    res = 8
    s = hexgrid.size_for_res(res)
    cx, cy = hexgrid.hex_center_exprs("q", "r", s)
    center = (
        spark.createDataFrame([(2, 1)], "q long, r long")
        .select(F.expr(cx).alias("x"), F.expr(cy).alias("y"))
        .collect()[0]
    )
    pts = spark.createDataFrame(
        [(f"d{i}", center.x + 0.001 * i, center.y) for i in range(5)],
        "doc_id string, lon double, lat double",
    )
    rows = hexgrid.hex_density(pts, res).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.hq, r.hr, r.n) == (2, 1, 5)
    assert abs(r.cx - center.x) < 1e-12 and abs(r.cy - center.y) < 1e-12


def test_encode_is_pure_jvm_map(spark):
    """The encode plan has no Python evaluation and no exchange; the
    density plan has exactly one exchange (the (hq, hr) hash
    aggregate), still no Python."""
    pts = spark.createDataFrame(
        [("a", 1.0, 2.0)], "doc_id string, lon double, lat double"
    )
    enc_plan = hexgrid.hex_cols(pts, 8)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in enc_plan and "Exchange" not in enc_plan
    den_plan = hexgrid.hex_density(pts, 8)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in den_plan
    assert den_plan.count("Exchange") == 1
