"""Semantic tests for operators/validation.py: exact ring
self-intersection detection and signed orientation, including
multi-ring (shell + hole) cases the SQL-mirrored corpus layer does
not exercise."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import validation

SF = "/root/testdata/sf0.001"


def _poly(poly_id, rings):
    """Build a (poly_id, geom) row dict from a list of rings, each a
    list of (x, y) in degrees, closed (first == last)."""
    xs, ys, offsets = [], [], [0]
    for ring in rings:
        xs += [p[0] for p in ring]
        ys += [p[1] for p in ring]
        offsets.append(len(xs))
    return (
        poly_id,
        {
            "gtype": "Polygon",
            "part_offsets": [0, 1],
            "ring_offsets": offsets,
            "xs": xs,
            "ys": ys,
        },
    )


GEOM_SCHEMA = (
    "poly_id string, geom struct<gtype:string, part_offsets:array<int>,"
    "ring_offsets:array<int>, xs:array<double>, ys:array<double>>"
)

SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
BOWTIE = [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0), (0.0, 0.0)]
HOLE_INSIDE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]
HOLE_CROSSING = [(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0), (2.0, 2.0)]


def test_corpus_layer_verdicts(spark):
    """Every bowtie pk (pk % 3 == 0) is invalid with exactly one
    crossing pair; every other ring is valid; edge counts follow the
    midpoint flag."""
    polys = corpus.validation_polygons(spark, SF)
    got = {
        r.poly_id: r
        for r in validation.validate_rings(polys).collect()
    }
    assert len(got) == 100
    for poly_id, r in got.items():
        pk = int(poly_id.split("-")[1])
        bowtie = pk % 3 == 0
        rev = pk % 3 != 0 and pk % 5 == 0
        mid = pk % 2 == 0
        expect_edges = 5 if (mid and not rev) else 4
        assert r.n_edges == expect_edges, poly_id
        assert r.is_valid == (not bowtie), poly_id
        assert r.n_crossings == (1 if bowtie else 0), poly_id


def test_corpus_layer_orientation(spark):
    """Valid CCW rings have positive exact area, reversed rings the
    exact negation of their CCW twin's formula, bowties exactly 0."""
    polys = corpus.validation_polygons(spark, SF)
    got = {
        r.poly_id: r
        for r in validation.ring_orientation(polys).collect()
    }
    assert len(got) == 100
    for poly_id, r in got.items():
        pk = int(poly_id.split("-")[1])
        if pk % 3 == 0:
            assert r.orientation == "degenerate", poly_id
            assert r.area2_u == 0, poly_id
        elif pk % 5 == 0:
            assert r.orientation == "CW" and r.area2_u < 0, poly_id
        else:
            assert r.orientation == "CCW" and r.area2_u > 0, poly_id
            # exact doubled area on the µdeg lattice: 2 * w_u * h_u
            w_u = round((pk % 7) * 2.0 + 5.0) * 1_000_000
            h_u = round((pk % 5) * 2.0 + 4.0) * 1_000_000
            assert r.area2_u == 2 * w_u * h_u, poly_id


def test_hole_crossing_shell_is_invalid(spark):
    """Cross-ring pairs count: a hole ring crossing its shell flags
    the polygon invalid, while a properly nested hole stays valid
    (hole edges never meet shell edges)."""
    df = spark.createDataFrame(
        [
            _poly("ok-hole", [SQUARE, HOLE_INSIDE]),
            _poly("bad-hole", [SQUARE, HOLE_CROSSING]),
        ],
        GEOM_SCHEMA,
    )
    got = {r.poly_id: r for r in validation.validate_rings(df).collect()}
    assert got["ok-hole"].is_valid
    assert got["ok-hole"].n_edges == 8
    assert not got["bad-hole"].is_valid
    # HOLE_CROSSING exits the shell exactly twice: its left edge
    # (2,2)-(2,6) crosses the shell top at (2,4), and its bottom edge
    # (6,2)-(2,2) crosses the shell right at (4,2).
    assert got["bad-hole"].n_crossings == 2


def test_orientation_per_ring_shell_and_hole(spark):
    """Orientation reports one row per ring: CCW shell, CW hole (the
    conventional winding for holes when the ring list is reversed)."""
    # HOLE_INSIDE winds (1,1)->(1,2)->(2,2)->(2,1): clockwise.
    df = spark.createDataFrame(
        [_poly("p", [SQUARE, HOLE_INSIDE])], GEOM_SCHEMA
    )
    rows = {
        r.ring: r
        for r in validation.ring_orientation(df).collect()
    }
    assert rows[0].orientation == "CCW"
    assert rows[0].area2_u == 2 * 4_000_000 * 4_000_000
    assert rows[1].orientation == "CW"
    assert rows[1].area2_u == -2 * 1_000_000 * 1_000_000


def test_adjacent_touching_edges_not_flagged(spark):
    """Consecutive edges and the first/last wrap pair share a vertex
    (the CLRS predicate counts touching) — the adjacency exclusion
    must keep a plain ring at zero crossings even with a collinear
    midpoint vertex."""
    mid_square = [
        (0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
        (0.0, 0.0),
    ]
    df = spark.createDataFrame([_poly("m", [mid_square])], GEOM_SCHEMA)
    r = validation.validate_rings(df).collect()[0]
    assert r.n_edges == 5 and r.n_crossings == 0 and r.is_valid


def test_edge_pair_join_is_poly_scoped(spark):
    """The edge-pair join keys on poly_id — an equi (hash/merge)
    join, never an all-pairs CartesianProduct. (The corpus GENERATOR
    contains a deliberate 25x4 nation x replica broadcast cross join,
    like every synthetic layer, so the assertion targets the pair
    join specifically.)"""
    polys = corpus.validation_polygons(spark, SF)
    plan = validation.validate_rings(polys)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert any(
        f"{kind} [poly_id" in plan
        for kind in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
