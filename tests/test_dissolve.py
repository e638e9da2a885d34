"""dissolve_area: exact union area per layer, verified against an
independent NumPy coordinate-compression brute force and hand cases."""

import numpy as np
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import overlay


def _union_area_np(rects):
    """Independent algorithm: compress BOTH axes, mark covered cells in
    a boolean grid, sum cell areas. rects = [(x0, y0, x1, y1)] ints."""
    if not rects:
        return 0
    xs = np.unique([v for r in rects for v in (r[0], r[2])])
    ys = np.unique([v for r in rects for v in (r[1], r[3])])
    grid = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    for x0, y0, x1, y1 in rects:
        i0, i1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
        j0, j1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
        grid[i0:i1, j0:j1] = True
    w = np.diff(xs)[:, None]
    h = np.diff(ys)[None, :]
    return int((grid * (w * h)).sum())


def _quantize(r):
    return (
        round(r["minx"] * overlay.COORD_SCALE),
        round(r["miny"] * overlay.COORD_SCALE),
        round(r["maxx"] * overlay.COORD_SCALE),
        round(r["maxy"] * overlay.COORD_SCALE),
    )


def test_dissolve_matches_numpy_grid_bruteforce(spark, sf_dir):
    polys = corpus.polygons(spark, sf_dir)
    by_layer = {}
    for r in polys.select("layer_id", "minx", "miny", "maxx", "maxy").collect():
        by_layer.setdefault(r["layer_id"], []).append(_quantize(r))
    got = {r["layer_id"]: r for r in overlay.dissolve_area(polys).collect()}
    assert set(got) == set(by_layer)
    for layer, rects in by_layer.items():
        assert got[layer]["union_area"] == _union_area_np(rects), layer
        assert got[layer]["n_polys"] == len(rects)
        assert got[layer]["sum_area"] == sum(
            (x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in rects
        )


def test_dissolve_hand_cases(spark):
    """Two half-overlapping unit squares union to 1.5; a disjoint third
    adds 1; a contained fourth adds 0."""
    rows = [
        ("L", 0.0, 0.0, 1.0, 1.0),
        ("L", 0.5, 0.0, 1.5, 1.0),   # overlap 0.5
        ("L", 10.0, 10.0, 11.0, 11.0),  # disjoint
        ("L", 0.1, 0.1, 0.2, 0.2),   # fully contained
        ("M", -1.0, -1.0, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "layer_id: string, minx: double, miny: double, maxx: double, maxy: double"
    )
    got = {r["layer_id"]: r for r in overlay.dissolve_area(df).collect()}
    s2 = overlay.COORD_SCALE * overlay.COORD_SCALE
    assert got["L"]["union_area"] == int(2.5 * s2)
    assert got["L"]["sum_area"] == int(3.01 * s2)
    assert got["M"]["union_area"] == int(1.0 * s2)


def test_dissolve_union_never_exceeds_sum(spark, sf_dir):
    out = overlay.dissolve_area(corpus.polygons(spark, sf_dir))
    assert out.filter(F.col("union_area") > F.col("sum_area")).count() == 0
    assert out.filter(F.col("union_area") <= 0).count() == 0
