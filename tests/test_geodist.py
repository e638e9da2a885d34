"""Semantic tests for operators/geodist.py: Hausdorff on a known
configuration and containment strictness."""

from geo_import_spark.operators import geodist as gd


def test_hausdorff_known_configuration(spark):
    # centers at (0,0) and (10,0); points: one ON a center, one at
    # (4,0) (min dist 4 to origin-center), one at (5,3) (min dist
    # sqrt(3^2+5^2)=sqrt(34)... to (10,0): dx=5,dy=3 -> 34; to (0,0):
    # 25+9=34 -> min 34) ... the farthest-from-its-nearest point is
    # (5,3) with d2=34 (in deg^2)
    pts = spark.createDataFrame(
        [("doc-0", 0.0, 0.0), ("doc-4", 4.0, 0.0), ("doc-8", 5.0, 3.0),
         ("doc-3", 99.0, 99.0)],  # id%4 != 0 -> excluded from sample
        "doc_id string, lon double, lat double",
    )
    polys = spark.createDataFrame(
        [("poly-a", -1.0, -1.0, 1.0, 1.0), ("poly-b", 9.0, -1.0, 11.0, 1.0)],
        "poly_id string, minx double, miny double, maxx double, maxy double",
    )
    row = gd.hausdorff_to_centers(pts, polys).collect()[0]
    assert (row.n_points, row.n_centers) == (3, 2)
    # doubled lattice: true d2 deg^2 * (2e6)^2
    assert row.hausdorff_d2 == 34 * (2_000_000 ** 2)
    assert row.worst_id == 8


def test_containment_strict(spark):
    polys = spark.createDataFrame(
        [
            ("outer", 0.0, 0.0, 10.0, 10.0),
            ("inner", 2.0, 2.0, 8.0, 8.0),
            ("edge", 0.0, 2.0, 8.0, 8.0),   # shares outer's minx -> NOT strict
            ("apart", 20.0, 20.0, 30.0, 30.0),
        ],
        "poly_id string, minx double, miny double, maxx double, maxy double",
    )
    got = {(r.outer_id, r.inner_id)
           for r in gd.containment_pairs(polys).collect()}
    # "edge" shares outer's min-x boundary, so strict containment
    # rejects it; only the fully-inside box pairs up
    assert got == {("outer", "inner")}
