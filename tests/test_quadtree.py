"""Adaptive quadtree tiling: partition property, size bounds, and
skew adaptivity."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import tiling


def _leaves(spark, sf_dir, **kw):
    return tiling.adaptive_tiles(corpus.points(spark, sf_dir), **kw).collect()


def _cell(lon, lat, level):
    n = 1 << level
    x = max(min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1), 0)
    y = max(min(int(math.floor((90.0 - lat) / 180.0 * n)), n - 1), 0)
    return x, y


def test_leaves_partition_every_point_once(spark, sf_dir):
    leaves = {
        (r["level"], r["tx"], r["ty"]): r["n_points"]
        for r in _leaves(spark, sf_dir)
    }
    pts = corpus.points(spark, sf_dir).collect()
    seen = {}
    for p in pts:
        owners = []
        for lvl in range(tiling.QT_MAX_LEVEL + 1):
            fx, fy = _cell(p["lon"], p["lat"], tiling.QT_MAX_LEVEL)
            key = (lvl, fx >> (tiling.QT_MAX_LEVEL - lvl),
                   fy >> (tiling.QT_MAX_LEVEL - lvl))
            if key in leaves:
                owners.append(key)
        assert len(owners) == 1, (p["doc_id"], owners)
        seen[owners[0]] = seen.get(owners[0], 0) + 1
    assert seen == leaves  # leaf counts == actual point ownership


def test_leaf_size_bounds_and_minimality(spark, sf_dir):
    rows = _leaves(spark, sf_dir)
    # python per-level histogram for the minimality check
    hist = {}
    for p in corpus.points(spark, sf_dir).collect():
        for lvl in range(tiling.QT_MAX_LEVEL + 1):
            fx, fy = _cell(p["lon"], p["lat"], tiling.QT_MAX_LEVEL)
            key = (lvl, fx >> (tiling.QT_MAX_LEVEL - lvl),
                   fy >> (tiling.QT_MAX_LEVEL - lvl))
            hist[key] = hist.get(key, 0) + 1
    assert rows
    for r in rows:
        if r["level"] < tiling.QT_MAX_LEVEL:
            assert r["n_points"] <= tiling.QT_MAX_PER_TILE
        if r["level"] > 0:
            # minimality: a non-root leaf's parent must overflow
            # (otherwise the parent would have been the leaf)
            parent = (r["level"] - 1, r["tx"] >> 1, r["ty"] >> 1)
            assert hist[parent] > tiling.QT_MAX_PER_TILE, (r, parent)


def test_hot_spot_splits_deeper_than_uniform_area(spark):
    # 2000 points inside one finest cell + 50 spread across the west
    rows = [
        Row(lon=10.0 + 1e-4 * (i % 10), lat=10.0 + 1e-4 * (i // 10 % 10))
        for i in range(2000)
    ] + [Row(lon=-170.0 + i * 0.8, lat=-80.0 + i * 1.5) for i in range(50)]
    df = spark.createDataFrame(rows)
    leaves = tiling.adaptive_tiles(df).collect()
    hot = [r for r in leaves if r["n_points"] > tiling.QT_MAX_PER_TILE]
    assert hot and all(r["level"] == tiling.QT_MAX_LEVEL for r in hot), (
        "the hot cell must be a forced max-level leaf"
    )
    sparse = [r for r in leaves if r["level"] <= 2]
    assert sparse, "the sparse area should stay coarse"
    assert sum(r["n_points"] for r in leaves) == 2050


def test_points_touched_once_in_plan(spark, sf_dir):
    plan = (
        tiling.adaptive_tiles(corpus.points(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only point-sized exchange keys on the finest grid histogram;
    # rollups reuse grid-bounded frames. Count scans of the parquet
    # source: must be 1 (the SQL mirror re-scans per level; we must not).
    assert plan.count("Scan parquet") <= 1


def test_raster_convolve_matches_python_kernel(spark, sf_dir):
    hist = {}
    for p in corpus.points(spark, sf_dir).collect():
        c = _cell(p["lon"], p["lat"], tiling.CONV_LEVEL)
        hist[c] = hist.get(c, 0) + 1
    w = dict(zip((-2, -1, 0, 1, 2), tiling.CONV_W))
    exp = {}
    for (x, y), n in hist.items():
        s = 0
        for dx, wx in w.items():
            for dy, wy in w.items():
                s += wx * wy * hist.get((x + dx, y + dy), 0)
        exp[(x, y)] = (n, s)
    got = {
        (r["x"], r["y"]): (r["n_points"], r["smooth"])
        for r in tiling.raster_convolve(
            corpus.points(spark, sf_dir)
        ).collect()
    }
    assert got == exp


def test_tile_pyramid_levels_consistent(spark, sf_dir):
    rows = tiling.tile_pyramid(corpus.points(spark, sf_dir)).collect()
    per_level = {}
    for r in rows:
        per_level.setdefault(r["level"], 0)
        per_level[r["level"]] += r["n_points"]
    total = corpus.points(spark, sf_dir).count()
    # every level partitions all points
    assert set(per_level) == set(range(tiling.QT_MAX_LEVEL + 1))
    assert all(v == total for v in per_level.values())
    counts = {(r["level"], r["tx"], r["ty"]): r["n_points"] for r in rows}
    # parent count == sum of its children
    for (lvl, tx, ty), n in counts.items():
        if lvl < tiling.QT_MAX_LEVEL:
            kids = sum(
                counts.get((lvl + 1, 2 * tx + dx, 2 * ty + dy), 0)
                for dx in (0, 1) for dy in (0, 1)
            )
            assert kids == n, (lvl, tx, ty)
    # root is the total
    assert counts[(0, 0, 0)] == total


def test_tile_thin_keeps_k_and_true_totals(spark, sf_dir):
    pts = corpus.points(spark, sf_dir)
    rows = tiling.tile_thin(pts).collect()
    per_tile = {}
    for r in rows:
        per_tile.setdefault((r["x"], r["y"]), []).append(r)
    # true totals from a direct histogram
    hist = {}
    for p in pts.collect():
        c = _cell(p["lon"], p["lat"], tiling.THIN_LEVEL)
        hist[c] = hist.get(c, 0) + 1
    assert set(per_tile) == set(hist)
    for c, rs in per_tile.items():
        assert len(rs) == min(tiling.THIN_K, hist[c])
        assert all(r["n_in_tile"] == hist[c] for r in rs)
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
