"""Property tests for convex_hull and simplify_lines (operators/
geomops.py) — the driver contract exempts iterative geometry from the
SQL oracle, so these pin correctness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import geomops


def _points(spark, rows):
    return spark.createDataFrame(rows, "layer_id string, lon double, lat double")


def _inside(hx, hy, px, py, tol=1e-9):
    """point-in-convex-CCW-hull via cross products."""
    n = len(hx)
    for i in range(n):
        j = (i + 1) % n
        cross = (hx[j] - hx[i]) * (py - hy[i]) - (hy[j] - hy[i]) * (px - hx[i])
        if cross < -tol:
            return False
    return True


def test_convex_hull_square_with_interior_points(spark):
    rows = [("a", 0.0, 0.0), ("a", 4.0, 0.0), ("a", 4.0, 4.0), ("a", 0.0, 4.0),
            ("a", 2.0, 2.0), ("a", 1.0, 3.0), ("a", 2.0, 0.0)]
    got = geomops.convex_hull(_points(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_hull == 4 and r.hull_area == 16.0
    assert set(zip(r.hull_xs, r.hull_ys)) == {(0, 0), (4, 0), (4, 4), (0, 4)}
    # CCW from lexicographic min
    assert (r.hull_xs[0], r.hull_ys[0]) == (0.0, 0.0)


def test_convex_hull_properties_random_and_multigroup(spark):
    rng = np.random.default_rng(11)
    rows = []
    pts = {}
    for g in ("g1", "g2"):
        p = rng.uniform(-50, 50, size=(200, 2)).round(3)
        pts[g] = p
        rows += [(g, float(x), float(y)) for x, y in p]
    # many partitions so the two-level merge actually exercises level 1
    df = _points(spark, rows).repartition(7)
    got = {r.layer_id: r for r in geomops.convex_hull(df).collect()}
    for g, p in pts.items():
        r = got[g]
        hull = set(zip(r.hull_xs, r.hull_ys))
        assert hull <= {(float(x), float(y)) for x, y in p}  # vertices are inputs
        for x, y in p:  # every point inside
            assert _inside(r.hull_xs, r.hull_ys, x, y), (g, x, y)
        assert r.hull_area > 0


def test_convex_hull_collinear_degenerates_to_segment(spark):
    rows = [("l", float(i), float(2 * i)) for i in range(5)]
    got = geomops.convex_hull(_points(spark, rows)).collect()[0]
    assert got.n_hull == 2 and got.hull_area == 0.0
    assert set(zip(got.hull_xs, got.hull_ys)) == {(0.0, 0.0), (4.0, 8.0)}


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "line_id string, xs array<double>, ys array<double>"
    )


def test_simplify_drops_collinear_keeps_corners(spark):
    xs = [0.0, 1.0, 2.0, 3.0, 3.0, 3.0]
    ys = [0.0, 0.0, 0.0, 0.0, 2.0, 4.0]
    got = geomops.simplify_lines(_lines(spark, [("l1", xs, ys)]), epsilon=0.0).collect()[0]
    assert got.xs == [0.0, 3.0, 3.0] and got.ys == [0.0, 0.0, 4.0]
    assert (got.n_in, got.n_out) == (6, 3)


def test_simplify_epsilon_controls_detail_and_is_idempotent(spark):
    # zigzag with amplitude 0.5 around y=0
    xs = [float(i) for i in range(11)]
    ys = [0.5 * (-1) ** i for i in range(11)]
    df = _lines(spark, [("z", xs, ys)])
    fine = geomops.simplify_lines(df, epsilon=0.01).collect()[0]
    coarse = geomops.simplify_lines(df, epsilon=2.0).collect()[0]
    assert fine.n_out == 11          # below amplitude: everything kept
    assert coarse.n_out == 2         # above amplitude: endpoints only
    # idempotence: simplifying the simplified line changes nothing
    again = geomops.simplify_lines(
        _lines(spark, [("z", fine.xs, fine.ys)]), epsilon=0.01
    ).collect()[0]
    assert again.xs == fine.xs and again.ys == fine.ys


def test_simplify_keeps_endpoints_and_subsequence(spark):
    rng = np.random.default_rng(5)
    xs = np.cumsum(rng.uniform(0.1, 1.0, 50)).tolist()
    ys = rng.uniform(-3, 3, 50).tolist()
    got = geomops.simplify_lines(_lines(spark, [("r", xs, ys)]), epsilon=1.0).collect()[0]
    assert got.xs[0] == xs[0] and got.xs[-1] == xs[-1]
    kept = list(zip(got.xs, got.ys))
    allp = list(zip(xs, ys))
    it = iter(allp)
    assert all(p in it for p in kept)  # kept is a subsequence of input
