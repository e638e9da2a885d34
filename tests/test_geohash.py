"""Geohash encoder: public-spec test vectors, prefix property, and
cell-coherence (nearby points share prefixes; a prefix is a spatial
containment claim)."""

from pyspark.sql import functions as F

from geo_import_spark.functions.geohash import GEOHASH_BASE32, geohash_col

VECTORS = [
    # (lon, lat, geohash) — canonical public examples
    (10.40744, 57.64911, "u4pruydqq"),
    (-5.6, 42.6, "ezs42e44y"),
    (0.0, 0.0, "s00000000"),
]


def _gh(spark, pts, p=9):
    df = spark.createDataFrame(pts, "lon double, lat double")
    return [
        r["gh"]
        for r in df.select(
            geohash_col(F.col("lon"), F.col("lat"), p).alias("gh")
        ).collect()
    ]


def test_public_vectors(spark):
    got = _gh(spark, [(v[0], v[1]) for v in VECTORS])
    assert got == [v[2] for v in VECTORS]


def test_precision_is_prefix(spark, sf_dir):
    from geo_import_spark import corpus

    pts = corpus.points(spark, sf_dir).limit(200)
    rows = pts.select(
        geohash_col(F.col("lon"), F.col("lat"), 9).alias("g9"),
        geohash_col(F.col("lon"), F.col("lat"), 4).alias("g4"),
    ).collect()
    assert rows
    for r in rows:
        assert r["g9"].startswith(r["g4"])
        assert all(c in GEOHASH_BASE32 for c in r["g9"])


def test_python_reference_parity(spark, sf_dir):
    """Bit-for-bit vs a pure-Python interval-halving reference (the
    textbook algorithm, independently coded)."""
    from geo_import_spark import corpus

    def py_geohash(lon, lat, p):
        lo = (-180.0, 180.0)
        la = (-90.0, 90.0)
        out, bit, ch, even = [], 0, 0, True
        while len(out) < p:
            if even:
                mid = (lo[0] + lo[1]) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lo = (mid, lo[1])
                else:
                    ch = ch * 2
                    lo = (lo[0], mid)
            else:
                mid = (la[0] + la[1]) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    la = (mid, la[1])
                else:
                    ch = ch * 2
                    la = (la[0], mid)
            even = not even
            bit += 1
            if bit == 5:
                out.append(GEOHASH_BASE32[ch])
                bit, ch = 0, 0
        return "".join(out)

    pts = corpus.points(spark, sf_dir).limit(300)
    rows = pts.select(
        "lon", "lat", geohash_col(F.col("lon"), F.col("lat"), 7).alias("gh")
    ).collect()
    for r in rows:
        assert r["gh"] == py_geohash(r["lon"], r["lat"], 7), (r["lon"], r["lat"])


def test_rollup_counts_are_prefix_consistent(spark, sf_dir):
    """Coarser-level counts equal the sum of their finer children and
    every level sums to the corpus size."""
    from collections import defaultdict

    from geo_import_spark import corpus
    from geo_import_spark.functions.geohash import geohash_rollup

    pts = corpus.points(spark, sf_dir)
    n = pts.count()
    rows = geohash_rollup(pts).collect()
    by_p = defaultdict(dict)
    for r in rows:
        by_p[r["precision"]][r["cell"]] = r["n_points"]
    assert set(by_p) == {2, 3, 4}
    for p in by_p:
        assert sum(by_p[p].values()) == n
    for cell, cnt in by_p[3].items():
        children = sum(v for c, v in by_p[4].items() if c.startswith(cell))
        assert children == cnt
