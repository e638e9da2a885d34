"""Multi-ring (holed polygon) PIP end-to-end: the even-odd ray cast
must reject bbox-passing candidates that fall inside a polygon's hole.
The hash-checked driver oracle (``pip_join_holes``) proves value-level
parity; this test proves the rejection is *non-trivial* on the corpus
(some candidates genuinely land in holes) so the oracle row cannot be
green vacuously."""

import os

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import pip as pipmod
from geo_import_spark.sources import geojson

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_holed_pip_rejects_hole_candidates(spark):
    docs = corpus.documents(spark, SF_DIR)
    pts = geojson.point_spans(docs)
    hp = corpus.holed_polygons(spark, SF_DIR)

    got = {
        (r["doc_id"], r["poly_id"])
        for r in pipmod.pip_join(pts, hp).select("doc_id", "poly_id").collect()
    }

    lon, lat = F.col("lon"), F.col("lat")
    in_shell = (
        (lon > F.col("x0")) & (lon < F.col("x1"))
        & (lat > F.col("y0")) & (lat < F.col("y1"))
    )
    in_hole = (
        (lon > F.col("ix0")) & (lon < F.col("ix1"))
        & (lat > F.col("iy0")) & (lat < F.col("iy1"))
    )
    cand = pts.crossJoin(hp.drop("geom"))
    want = {
        (r["doc_id"], r["poly_id"])
        for r in cand.filter(in_shell & ~in_hole)
        .select("doc_id", "poly_id")
        .collect()
    }
    rejected = cand.filter(in_shell & in_hole).count()

    assert got == want
    assert len(got) > 0, "no containment hits — layer/point extents diverged"
    assert rejected > 0, "no candidates in holes — the multi-ring path is untested"


def test_multipart_pip_matches_or_of_parts(spark):
    """MultiPolygon (part_offsets [0,1,2]) containment == inside part
    A OR inside part B; points in the gap between the disjoint parts
    pass the global-bbox prefilter yet must be rejected by the ray
    cast — assert that rejection actually fires on the corpus."""
    docs = corpus.documents(spark, SF_DIR)
    pts = geojson.point_spans(docs)
    mp = corpus.multipart_polygons(spark, SF_DIR)

    got = {
        (r["doc_id"], r["poly_id"])
        for r in pipmod.pip_join(pts, mp).select("doc_id", "poly_id").collect()
    }

    lon, lat = F.col("lon"), F.col("lat")
    in_a = (
        (lon > F.col("ax0")) & (lon < F.col("ax1"))
        & (lat > F.col("ay0")) & (lat < F.col("ay1"))
    )
    in_b = (
        (lon > F.col("bx0")) & (lon < F.col("bx1"))
        & (lat > F.col("by0")) & (lat < F.col("by1"))
    )
    in_gap = (
        (lon > F.col("ax1")) & (lon < F.col("bx0"))
        & (lat > F.col("ay0")) & (lat < F.col("ay1"))
    )
    cand = pts.crossJoin(mp.drop("geom"))
    want = {
        (r["doc_id"], r["poly_id"])
        for r in cand.filter(in_a | in_b).select("doc_id", "poly_id").collect()
    }
    gap = cand.filter(in_gap).count()

    assert got == want
    assert len(got) > 0
    assert gap > 0, "no candidates in the inter-part gap — multi-part path untested"


def test_holed_layer_ring_offsets_shape(spark):
    row = corpus.holed_polygons(spark, SF_DIR).select("geom").first()["geom"]
    assert list(row["ring_offsets"]) == [0, 5, 10]
    assert list(row["part_offsets"]) == [0, 1]
    # closed rings: first vertex == last vertex within each ring
    xs, ys = list(row["xs"]), list(row["ys"])
    assert (xs[0], ys[0]) == (xs[4], ys[4])
    assert (xs[5], ys[5]) == (xs[9], ys[9])
