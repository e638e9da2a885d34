"""Semantic tests for operators/spatialstats.py: Moran's I sign on
known spatial patterns and bucketed pair counts vs NumPy brute force."""

import numpy as np

from geo_import_spark.operators import spatialstats as ss


def _pts(spark, coords):
    return spark.createDataFrame(
        [(f"doc-{i}", float(lon), float(lat))
         for i, (lon, lat) in enumerate(coords)],
        "doc_id string, lon double, lat double",
    )


def _cell_center(x, y):
    n = 1 << ss.MORAN_LEVEL
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = 90.0 - (y + 0.5) / n * 180.0
    return lon, lat


def test_morans_i_negative_on_checkerboard(spark):
    # 4x4 block of cells, alternating 1-point and 5-point loads —
    # high cells always neighbor low cells -> strong NEGATIVE I
    coords = []
    for x in range(4):
        for y in range(4):
            load = 5 if (x + y) % 2 == 0 else 1
            coords += [_cell_center(x, y)] * load
    row = ss.morans_i(_pts(spark, coords)).collect()[0]
    assert row.n_cells == 16
    # interior rook grid: 2*2*n_rows*n_cols - ... directed pairs = 48
    assert row.w_pairs == 48
    assert row.morans_i < -0.9


def test_morans_i_positive_on_gradient(spark):
    # two 2x2 clusters far apart: one all-heavy, one all-light —
    # neighbors are always equal -> strong POSITIVE I
    coords = []
    for x in range(2):
        for y in range(2):
            coords += [_cell_center(x, y)] * 6
            coords += [_cell_center(x + 30, y + 30)] * 1
    row = ss.morans_i(_pts(spark, coords)).collect()[0]
    assert row.n_cells == 8
    assert row.morans_i > 0.9


def test_pair_counts_match_brute_force(spark):
    rng = np.random.RandomState(7)
    lon = rng.uniform(-60, 60, 400).round(6)
    lat = rng.uniform(-40, 40, 400).round(6)
    # keep only ids % MOD == 0 in the operator's own sampling; feed
    # ids that are ALL multiples so the whole set participates
    df = spark.createDataFrame(
        [(f"doc-{i * ss.PAIR_SAMPLE_MOD}", float(a), float(b))
         for i, (a, b) in enumerate(zip(lon, lat))],
        "doc_id string, lon double, lat double",
    )
    got = {r.radius_udeg: r.n_pairs
           for r in ss.pair_counts(df).collect()}

    ix = np.round(lon * 1e6).astype(np.int64)
    iy = np.round(lat * 1e6).astype(np.int64)
    dx = ix[:, None] - ix[None, :]
    dy = iy[:, None] - iy[None, :]
    d2 = dx * dx + dy * dy
    iu = np.triu_indices(len(ix), k=1)
    for r in ss.PAIR_RADII_UDEG:
        expect = int((d2[iu] <= r * r).sum())
        assert got.get(r, 0) == expect, r
