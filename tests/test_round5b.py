"""Round-5 batch 2: local clustering coefficient, Geary's C,
geodesic (sinusoidal) polygon area, raster buffer cells.

Corpus parity with the DuckDB oracles runs in test_oracle_parity.py
(auto-parametrized); these tests pin the semantics on planted inputs
where the expected answer is known by construction.
"""

import math

import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import geomops as geomopsmod
from geo_import_spark.operators import graph as graphmod
from geo_import_spark.operators import spatialstats, tiling


def _lineitem_from_orders(spark, orders):
    rows = [(ok, s) for ok, sups in orders for s in sups]
    return spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")


# --- local clustering coefficient -------------------------------------------


def test_local_clustering_triangle_plus_tail(spark):
    # K3 on {1,2,3} plus a pendant 3-4: lcc(1)=lcc(2)=1.0,
    # lcc(3)=2*1/(3*2)=1/3, lcc(4)=0 (degree 1)
    li = _lineitem_from_orders(
        spark, [(10, [1, 2]), (20, [2, 3]), (30, [1, 3]), (40, [3, 4])]
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc"])
        for r in graphmod.local_clustering(li).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, pytest.approx(1.0 / 3.0))
    assert got[4] == (1, 0, 0.0)


def test_local_clustering_k4_all_one(spark):
    # K4: every node has degree 3 and sits in C(3,2)=3 triangles
    li = _lineitem_from_orders(spark, [(1, [1, 2, 3, 4])])
    rows = graphmod.local_clustering(li).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r["degree"], r["triangles"], r["lcc"]) == (3, 3, 1.0)


def test_local_clustering_square_no_triangles(spark):
    # 4-cycle: degree 2 everywhere, zero triangles, lcc 0.0
    li = _lineitem_from_orders(
        spark, [(1, [1, 2]), (2, [2, 3]), (3, [3, 4]), (4, [1, 4])]
    )
    rows = graphmod.local_clustering(li).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r["degree"], r["triangles"], r["lcc"]) == (2, 0, 0.0)


# --- Geary's C ---------------------------------------------------------------


def _points(spark, lonlats):
    return spark.createDataFrame(lonlats, "lon double, lat double")


def _cell_center(x, y):
    """lon/lat landing exactly in grid cell (x, y) at MORAN_LEVEL."""
    n = 1 << spatialstats.MORAN_LEVEL
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = 90.0 - (y + 0.5) / n * 180.0
    return lon, lat


def test_gearys_c_uniform_adjacent_undefined(spark):
    # two adjacent cells with EQUAL counts: num = 0, but the variance
    # denominator is also 0 — C is 0/0, undefined, and both engines
    # must return NULL rather than divide by zero
    pts = [_cell_center(10, 10), _cell_center(11, 10)]
    out = spatialstats.gearys_c(_points(spark, pts)).collect()[0]
    assert out["n_cells"] == 2
    assert out["w_pairs"] == 2  # directed rook pairs
    assert out["num"] == 0.0 and out["den"] == 0.0
    assert out["gearys_c"] is None


def test_gearys_c_hand_computed(spark):
    # cells a=(10,10) n=1, b=(11,10) n=3 (adjacent):
    # num = (1-3)^2 + (3-1)^2 = 8 ; mean = 2, sum z^2 = 1+1 = 2
    # C = (N-1) * 8 / (2 * W * 2) with N=2, W=2 => 8/8 = 1.0
    a = _cell_center(10, 10)
    b = _cell_center(11, 10)
    pts = [a, b, b, b]
    out = spatialstats.gearys_c(_points(spark, pts)).collect()[0]
    assert out["n_cells"] == 2 and out["w_pairs"] == 2
    assert out["num"] == 8.0
    assert out["gearys_c"] == pytest.approx(1.0)


def test_gearys_c_isolated_cells_null(spark):
    # no two occupied cells are rook-adjacent: w_pairs = 0 => NULL
    pts = [_cell_center(5, 5), _cell_center(20, 20)]
    out = spatialstats.gearys_c(_points(spark, pts)).collect()[0]
    assert out["w_pairs"] == 0
    assert out["gearys_c"] is None


# --- geodesic area -----------------------------------------------------------


def _poly_df(spark, poly_id, ring):
    """Single-ring polygon frame in the geom struct layout."""
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return spark.createDataFrame(
        [(poly_id, (xs, ys, [0]))],
        "poly_id string, geom struct<xs: array<double>, ys: array<double>, ring_offsets: array<int>>",
    )


EARTH_R = 6371.0088


def test_geodesic_area_equator_square(spark):
    # 1°x1° square on the equator: true spherical area
    # R^2 * dλ * (sin φ1 − sin φ0); sinusoidal estimate is within ~0.01%
    ring = [(0.0, -0.5), (1.0, -0.5), (1.0, 0.5), (0.0, 0.5), (0.0, -0.5)]
    got = geomopsmod.geodesic_area(_poly_df(spark, "p", ring)).collect()[0]
    d = math.radians(1.0)
    expected = EARTH_R**2 * d * (math.sin(math.radians(0.5)) - math.sin(math.radians(-0.5)))
    assert got["n_vertices"] == 5
    assert got["area_km2"] == pytest.approx(expected, rel=1e-4)


def test_geodesic_area_shrinks_with_latitude(spark):
    # the same 1°x1° footprint at 60°N has ~cos(60°)=0.5 the area
    eq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    hi = [(0.0, 59.5), (1.0, 59.5), (1.0, 60.5), (0.0, 60.5), (0.0, 59.5)]
    a_eq = geomopsmod.geodesic_area(_poly_df(spark, "a", eq)).collect()[0]["area_km2"]
    a_hi = geomopsmod.geodesic_area(_poly_df(spark, "b", hi)).collect()[0]["area_km2"]
    assert a_hi / a_eq == pytest.approx(math.cos(math.radians(60.0)), rel=2e-3)


def test_geodesic_area_orientation_invariant(spark):
    # |shoelace| makes CW and CCW rings agree
    ccw = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    cw = list(reversed(ccw))
    a1 = geomopsmod.geodesic_area(_poly_df(spark, "a", ccw)).collect()[0]["area_km2"]
    a2 = geomopsmod.geodesic_area(_poly_df(spark, "b", cw)).collect()[0]["area_km2"]
    assert a1 == a2 > 0


def test_geodesic_area_hole_subtracts(spark):
    # outer 4°x4° CCW ring + inner 2°x2° CW hole: per-ring shoelaces
    # carry opposite signs, so the hole subtracts from the outer area
    outer = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)]
    xs = [p[0] for p in outer] + [p[0] for p in hole]
    ys = [p[1] for p in outer] + [p[1] for p in hole]
    df = spark.createDataFrame(
        [("p", (xs, ys, [0, 5]))],
        "poly_id string, geom struct<xs: array<double>, ys: array<double>, ring_offsets: array<int>>",
    )
    a_with_hole = geomopsmod.geodesic_area(df).collect()[0]["area_km2"]
    a_outer = geomopsmod.geodesic_area(_poly_df(spark, "o", outer)).collect()[0]["area_km2"]
    a_hole = geomopsmod.geodesic_area(_poly_df(spark, "h", hole)).collect()[0]["area_km2"]
    assert a_with_hole == pytest.approx(a_outer - a_hole, rel=1e-12)


def test_polynomial_cos_accuracy():
    # the bit-exactness contract trades libm cos for an explicit
    # polynomial; pin its accuracy over the full latitude range
    for deg in range(-90, 91, 5):
        t = math.radians(deg)
        tt = t * t
        poly = 1.0 + tt * (
            geomopsmod._COS_C2
            + tt
            * (
                geomopsmod._COS_C4
                + tt * (geomopsmod._COS_C6 + tt * geomopsmod._COS_C8)
            )
        )
        assert abs(poly - math.cos(t)) < 3e-5


# --- buffer cells ------------------------------------------------------------


def _rect_poly(spark, poly_id, minx, miny, maxx, maxy):
    return spark.createDataFrame(
        [(poly_id, float(minx), float(miny), float(maxx), float(maxy))],
        "poly_id string, minx double, miny double, maxx double, maxy double",
    )


def test_buffer_cells_halo_shape(spark):
    # a polygon covered by exactly ONE z=7 tile buffers to a 3x3 block
    # with the single core tile flagged
    polys = _rect_poly(spark, "p", 1.0, 1.0, 1.5, 1.5)
    cover = tiling.cover_tiles(polys, z=7)
    assert cover.count() == 1
    c = cover.collect()[0]
    out = tiling.buffer_cells(polys, z=7, k=1).collect()
    assert len(out) == 9
    cells = {(r["x"], r["y"]): r["is_core"] for r in out}
    assert cells[(c["x"], c["y"])] is True
    assert sum(cells.values()) == 1
    for (x, y) in cells:
        assert abs(x - c["x"]) <= 1 and abs(y - c["y"]) <= 1


def test_buffer_cells_k2_chebyshev(spark):
    # k=2 dilation of a single tile is the 5x5 Chebyshev ball
    polys = _rect_poly(spark, "p", 10.0, 10.0, 10.2, 10.2)
    out = tiling.buffer_cells(polys, z=7, k=2).collect()
    assert len(out) == 25
    assert sum(1 for r in out if r["is_core"]) == 1


def test_buffer_cells_overlapping_halos_dedup(spark):
    # two horizontally-adjacent core tiles: dilation is a 4x3 block
    # (12 cells), cores flagged on both
    z, n = 7, 1 << 7
    # one tile at z=7 spans 360/128 = 2.8125 degrees of longitude
    w = 360.0 / n
    polys = _rect_poly(spark, "p", -w * 0.5, 1.0, w * 0.5, 1.5)
    cover = tiling.cover_tiles(polys, z=z)
    assert cover.count() == 2
    out = tiling.buffer_cells(polys, z=z, k=1).collect()
    assert len(out) == 12
    assert sum(1 for r in out if r["is_core"]) == 2


def test_buffer_cells_clamped_at_world_edge(spark):
    # a polygon covering the top-left corner tile (0,0): the halo
    # cannot leave the world, so only the in-range 2x2 quadrant stays
    polys = _rect_poly(spark, "p", -179.9, 84.9, -179.8, 84.95)
    cover = tiling.cover_tiles(polys, z=7).collect()
    assert len(cover) == 1 and cover[0]["x"] == 0
    out = tiling.buffer_cells(polys, z=7, k=1).collect()
    xs = {(r["x"], r["y"]) for r in out}
    assert all(x >= 0 and y >= 0 for x, y in xs)
    assert len(out) in (4, 6)  # corner (y=0) -> 4; one row down -> 6


# --- dup coverage ------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dup_coverage_planted(spark):
    from geo_import_spark.operators import dedup as dedupmod

    blk = "A" * 16  # one duplicated window, shared by docs 0 and 1
    docs = _docs_df(
        spark,
        [
            blk + "x" * 16,   # 32 chars, 16 duplicated -> 0.5
            "y" * 16 + blk,   # 32 chars, 16 duplicated -> 0.5
            # all-distinct chars: no window repeats anywhere ("z"*32
            # would NOT do — its own two windows duplicate each other)
            "abcdefghijklmnopqrstuvwxyz012345",
            "short",          # < one window -> 0 windows, 0.0
            "",               # empty text -> guard, 0.0 not NaN
        ],
    )
    got = {
        r["doc_id"]: (r["text_len"], r["dup_chars"], r["dup_frac"])
        for r in dedupmod.dup_coverage(docs, k=16).collect()
    }
    assert got[0] == (32, 16, 0.5)
    assert got[1] == (32, 16, 0.5)
    assert got[2] == (32, 0, 0.0)
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    assert len(got) == 5  # total function of the corpus


def test_dup_coverage_full_dup_doc(spark):
    from geo_import_spark.operators import dedup as dedupmod

    # doc 0 repeats one window 4x (within-doc dup); every window
    # duplicated -> frac 1.0
    docs = _docs_df(spark, ["B" * 64, "unrelated text here....."])
    got = {
        r["doc_id"]: r["dup_frac"]
        for r in dedupmod.dup_coverage(docs, k=16).collect()
    }
    assert got[0] == 1.0
    assert got[1] == 0.0


# --- product quantization ------------------------------------------------------


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _pq_corpus():
    """4 orthogonal-ish anchors (the codebooks: vec_id 0-3) + noisy
    copies clustered around each anchor."""
    import numpy as np

    rng = np.random.RandomState(7)
    # anchors distinct in EVERY subspace (anchor j = all-10j): a
    # per-subspace-one-hot design would leave zero-slices tied across
    # codebooks and the first-min tie-break would pick code 1
    anchors = np.stack([np.full(64, 10.0 * j) for j in range(4)])
    vecs = [anchors[j] for j in range(4)]
    owner = []
    for i in range(24):
        j = i % 4
        owner.append(j)
        vecs.append(anchors[j] + rng.uniform(-0.5, 0.5, 64))
    return vecs, owner


def test_pq_codes_codebook_vectors_self_code(spark):
    from geo_import_spark.operators import similarity

    vecs, _ = _pq_corpus()
    got = {
        r["vec_id"]: (r["c1"], r["c2"], r["c3"], r["c4"])
        for r in similarity.pq_codes(_emb_df(spark, vecs)).collect()
    }
    # each codebook vector is distance-0 from itself in every subspace
    for j in range(4):
        assert got[j] == (j + 1, j + 1, j + 1, j + 1)
    assert len(got) == len(vecs)


def test_pq_codes_cluster_members_share_owner_code(spark):
    from geo_import_spark.operators import similarity

    vecs, owner = _pq_corpus()
    got = {
        r["vec_id"]: (r["c1"], r["c2"], r["c3"], r["c4"])
        for r in similarity.pq_codes(_emb_df(spark, vecs)).collect()
    }
    # a noisy copy of anchor j is nearest codebook j in every subspace
    for i, j in enumerate(owner):
        assert got[4 + i] == (j + 1, j + 1, j + 1, j + 1)


def test_pq_adc_self_is_rank_one_for_codebook_queries(spark):
    from geo_import_spark.operators import similarity

    vecs, _ = _pq_corpus()
    out = similarity.pq_adc_topk(_emb_df(spark, vecs), n_queries=4, k=5)
    top = {
        r["query_id"]: r["vec_id"] for r in out.collect() if r["rank"] == 1
    }
    # a codebook vector reconstructs exactly: ADC(q, q) = 0 => rank 1
    for j in range(4):
        assert top[j] == j


def test_pq_adc_retrieves_own_cluster(spark):
    from geo_import_spark.operators import similarity

    vecs, owner = _pq_corpus()
    out = similarity.pq_adc_topk(_emb_df(spark, vecs), n_queries=4, k=7)
    mates = {j: {j} | {4 + i for i, o in enumerate(owner) if o == j}
             for j in range(4)}
    rows = [r for r in out.collect()]
    assert len(rows) == 4 * 7
    for r in rows:
        # every retrieved vector belongs to the query's own cluster
        # (clusters are separated by >> intra-cluster noise)
        assert r["vec_id"] in mates[r["query_id"]]
