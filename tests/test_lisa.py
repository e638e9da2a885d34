"""Local Moran's I: planted hot-cluster labels, the Σ I_i = W·I
global-local identity, and isolated-cell handling. Corpus hash parity
runs in test_oracle_parity.py (`local_morans`)."""

from pyspark.sql import functions as F

from geo_import_spark.operators import spatialstats

# grid level 6 -> 64x64 cells, 5.625 deg wide; cell center helper
_W = 360.0 / 64
_H = 180.0 / 64


def _pts(spark, cells):
    # cells: list of (gx, gy, count) — emit `count` points at the
    # cell center
    rows = []
    for gx, gy, n in cells:
        lon = -180.0 + (gx + 0.5) * _W
        lat = 90.0 - (gy + 0.5) * _H
        rows += [(lon, lat)] * n
    return spark.createDataFrame(rows, "lon double, lat double")


def test_hot_pair_labeled_hh(spark):
    # two adjacent heavy cells + two far-apart light cells: the heavy
    # pair are mutual rook neighbors with positive deviations -> HH;
    # the light cells (negative deviation, no neighbors) lag 0 -> NS
    df = spatialstats.local_morans(
        _pts(spark, [(10, 10, 50), (11, 10, 50), (40, 40, 2), (50, 50, 2)])
    )
    lab = {(r["x"], r["y"]): r["label"] for r in df.collect()}
    assert lab[(10, 10)] == "HH" and lab[(11, 10)] == "HH"
    assert lab[(40, 40)] == "NS" and lab[(50, 50)] == "NS"


def test_cold_outlier_labeled_lh(spark):
    # a light cell squeezed between two heavy neighbors: negative
    # deviation, positive lag -> LH outlier
    df = spatialstats.local_morans(
        _pts(spark, [(10, 10, 40), (11, 10, 4), (12, 10, 40), (40, 40, 4)])
    )
    lab = {(r["x"], r["y"]): r["label"] for r in df.collect()}
    assert lab[(11, 10)] == "LH"
    assert lab[(10, 10)] == "HL" and lab[(12, 10)] == "HL"


def test_sum_identity_with_global(spark, sf_dir):
    # Anselin's identity: sum_i I_i = W * I_global (binary weights)
    from geo_import_spark import corpus
    from geo_import_spark.sources import geojson

    pts = geojson.point_spans(corpus.documents(spark, sf_dir)).cache()
    try:
        local = spatialstats.local_morans(pts).agg(
            F.sum("lisa").alias("s")
        ).collect()[0]["s"]
        g = spatialstats.morans_i(pts).collect()[0]
        expected = g["w_pairs"] * g["morans_i"]
        assert abs(local - expected) <= 1e-9 * max(1.0, abs(expected))
    finally:
        pts.unpersist()


def test_all_equal_grid_null_lisa(spark):
    # identical counts everywhere -> den = 0 -> lisa NULL, labels NS
    df = spatialstats.local_morans(
        _pts(spark, [(1, 1, 3), (5, 5, 3), (9, 9, 3)])
    )
    rows = df.collect()
    assert all(r["lisa"] is None for r in rows)
    assert all(r["label"] == "NS" for r in rows)
