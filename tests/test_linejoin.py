"""Segment-intersection join: exact predicate semantics (crossing,
touching, collinear overlap, disjoint), brute-force equivalence, and
the no-cross-join plan guarantee."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import linejoin


def _seg_df(spark, rows, ids=None):
    ids = ids or [f"s{i}" for i in range(len(rows))]
    return spark.createDataFrame(
        [(i, *map(int, r)) for i, r in zip(ids, rows)],
        "line_id string, x1 long, y1 long, x2 long, y2 long",
    )


def _pairs(spark, a_rows, b_rows):
    out = linejoin.segment_intersect_join(
        _seg_df(spark, a_rows), _seg_df(spark, b_rows, ["t0"])
    )
    return {(r["a_id"], r["b_id"]) for r in out.collect()}


def test_predicate_cases(spark):
    b = [(0, 0, 100, 100)]  # the diagonal
    cases = {
        "s0": ((0, 100, 100, 0), True),     # proper X crossing
        "s1": ((50, 50, 200, 50), True),    # endpoint b-interior touch
        "s2": ((100, 100, 200, 100), True), # endpoint-endpoint touch
        "s3": ((25, 25, 75, 75), True),     # collinear, contained overlap
        "s4": ((101, 101, 200, 200), False),# collinear, disjoint
        "s5": ((0, 1, 100, 101), False),    # parallel offset
        "s6": ((60, 40, 200, 0), False),    # same quadrant, misses
    }
    got = _pairs(spark, [c[0] for c in cases.values()], b)
    # ids assigned in order s0..s6
    exp = {(k, "t0") for k, (_, hit) in cases.items() if hit}
    assert got == exp


def test_matches_bruteforce_on_corpus(spark, sf_dir):
    a = corpus.line_segments_a(spark, sf_dir).collect()
    b = corpus.line_segments_b(spark, sf_dir).collect()

    def cross(p1, p2, q):
        return (p2[0] - p1[0]) * (q[1] - p1[1]) - (p2[1] - p1[1]) * (
            q[0] - p1[0]
        )

    def onseg(p1, p2, q):
        return (
            min(p1[0], p2[0]) <= q[0] <= max(p1[0], p2[0])
            and min(p1[1], p2[1]) <= q[1] <= max(p1[1], p2[1])
        )

    def hit(sa, sb):
        a1, a2 = (sa["x1"], sa["y1"]), (sa["x2"], sa["y2"])
        b1, b2 = (sb["x1"], sb["y1"]), (sb["x2"], sb["y2"])
        d1, d2 = cross(b1, b2, a1), cross(b1, b2, a2)
        d3, d4 = cross(a1, a2, b1), cross(a1, a2, b2)
        if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
            return True
        return (
            (d1 == 0 and onseg(b1, b2, a1))
            or (d2 == 0 and onseg(b1, b2, a2))
            or (d3 == 0 and onseg(a1, a2, b1))
            or (d4 == 0 and onseg(a1, a2, b2))
        )

    exp = {
        (sa["line_id"], sb["line_id"]) for sa in a for sb in b if hit(sa, sb)
    }
    got = {
        (r["a_id"], r["b_id"])
        for r in linejoin.segment_intersect_join(
            corpus.line_segments_a(spark, sf_dir),
            corpus.line_segments_b(spark, sf_dir),
        ).collect()
    }
    assert got == exp
    assert got, "corpus should produce intersections at test SF"


def test_no_cross_join_in_plan(spark, sf_dir):
    plan = (
        linejoin.segment_intersect_join(
            corpus.line_segments_a(spark, sf_dir),
            corpus.line_segments_b(spark, sf_dir),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_cover_is_bounded_by_4_cells(spark, sf_dir):
    """The corpus guarantees |dx|,|dy| < SEG_GRID, so every segment's
    bbox cover is at most 2x2 cells."""
    per_seg = (
        linejoin._cover(corpus.line_segments_b(spark, sf_dir), "b",
                        linejoin.SEG_GRID)
        .groupBy("b_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_seg <= 4


def test_intersection_points_lie_on_both_segments(spark, sf_dir):
    """Every proper-crossing point satisfies both parametric equations
    (checked against an independent NumPy solve) and proper pairs are
    a subset of the inclusive join."""
    import numpy as np

    a = corpus.line_segments_a(spark, sf_dir)
    b = corpus.line_segments_b(spark, sf_dir)
    pts = linejoin.segment_intersection_points(a, b).collect()
    seg_a = {r["line_id"]: r for r in a.collect()}
    seg_b = {r["line_id"]: r for r in b.collect()}
    inclusive = {
        (r["a_id"], r["b_id"])
        for r in linejoin.segment_intersect_join(a, b).collect()
    }
    assert pts
    assert {(r["a_id"], r["b_id"]) for r in pts} <= inclusive
    for r in pts:
        sa, sb = seg_a[r["a_id"]], seg_b[r["b_id"]]
        # solve a1 + s*(a2-a1) = b1 + t*(b2-b1)
        m = np.array(
            [[sa["x2"] - sa["x1"], -(sb["x2"] - sb["x1"])],
             [sa["y2"] - sa["y1"], -(sb["y2"] - sb["y1"])]],
            dtype=float,
        )
        rhs = np.array([sb["x1"] - sa["x1"], sb["y1"] - sa["y1"]], dtype=float)
        s, t = np.linalg.solve(m, rhs)
        assert 0.0 < s < 1.0 and 0.0 < t < 1.0
        ex = sa["x1"] + s * (sa["x2"] - sa["x1"])
        ey = sa["y1"] + s * (sa["y2"] - sa["y1"])
        assert abs(r["ix"] - ex) < 1e-3 and abs(r["iy"] - ey) < 1e-3


def test_clip_segments_semantics(spark, sf_dir):
    """Clipped endpoints lie inside the window (up to double eps) and
    on the parent segment; fully-inside segments pass unchanged; a
    NumPy Liang-Barsky mirror agrees on the row set."""
    import numpy as np

    segs = corpus.line_segments_a(spark, sf_dir)
    polys = corpus.polygons(spark, sf_dir)
    rows = linejoin.clip_segments(segs, polys).collect()
    s = {r["line_id"]: r for r in segs.collect()}
    p = {r["poly_id"]: r for r in polys.collect()}
    assert rows, "corpus should produce clips at test SF"

    exp_pairs = set()
    for sid, sr in s.items():
        x1, y1 = sr["x1"] / 1e6, sr["y1"] / 1e6
        x2, y2 = sr["x2"] / 1e6, sr["y2"] / 1e6
        for pid, pr in p.items():
            dx, dy = x2 - x1, y2 - y1
            t0, t1 = 0.0, 1.0
            ok = True
            for d, lo, hi, c in ((dx, pr["minx"], pr["maxx"], x1),
                                 (dy, pr["miny"], pr["maxy"], y1)):
                if d == 0:
                    if not (lo <= c <= hi):
                        ok = False
                        break
                else:
                    ta, tb = (lo - c) / d, (hi - c) / d
                    t0 = max(t0, min(ta, tb))
                    t1 = min(t1, max(ta, tb))
            if ok and t0 <= t1:
                exp_pairs.add((sid, pid))
    assert {(r["a_id"], r["poly_id"]) for r in rows} == exp_pairs

    eps = 1e-9
    for r in rows:
        pr = p[r["poly_id"]]
        for cx, cy in ((r["cx1"], r["cy1"]), (r["cx2"], r["cy2"])):
            assert pr["minx"] - eps <= cx <= pr["maxx"] + eps
            assert pr["miny"] - eps <= cy <= pr["maxy"] + eps
        sr = s[r["a_id"]]
        # collinearity with the parent segment (double tolerance)
        dx, dy = (sr["x2"] - sr["x1"]) / 1e6, (sr["y2"] - sr["y1"]) / 1e6
        for cx, cy in ((r["cx1"], r["cy1"]), (r["cx2"], r["cy2"])):
            cross = (cx - sr["x1"] / 1e6) * dy - (cy - sr["y1"] / 1e6) * dx
            assert abs(cross) < 1e-9


def test_near_segment_join_matches_bruteforce(spark, sf_dir):
    """Exact point-segment distance semantics vs a Fraction-exact
    Python brute force (no floats anywhere)."""
    from fractions import Fraction

    import __spark_entry__ as em

    pts = em._box_points_u(spark, sf_dir)
    segs = corpus.line_segments_a(spark, sf_dir)
    got = {
        (r["pt_id"], r["line_id"])
        for r in linejoin.near_segment_join(pts, segs).collect()
    }
    r2 = linejoin.NEAR_RADIUS_U ** 2

    def d2_point_seg(px, py, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        dot = (px - x1) * dx + (py - y1) * dy
        dd = dx * dx + dy * dy
        if dot <= 0:
            return Fraction((px - x1) ** 2 + (py - y1) ** 2)
        if dot >= dd:
            return Fraction((px - x2) ** 2 + (py - y2) ** 2)
        cross = (px - x1) * dy - (py - y1) * dx
        return Fraction(cross * cross, dd)

    exp = set()
    for p in pts.collect():
        for s in segs.collect():
            if d2_point_seg(p["x"], p["y"], s["x1"], s["y1"],
                            s["x2"], s["y2"]) <= r2:
                exp.add((p["pt_id"], s["line_id"]))
    assert got == exp
    assert got, "corpus should produce near-segment hits at test SF"


def test_near_segment_join_no_dedup_shuffle_needed(spark, sf_dir):
    """Each point contributes exactly one cell, so candidate pairs are
    unique without a distinct — assert no pair appears twice."""
    import __spark_entry__ as em

    df = linejoin.near_segment_join(
        em._box_points_u(spark, sf_dir),
        corpus.line_segments_a(spark, sf_dir),
    )
    total = df.count()
    assert df.distinct().count() == total


def test_snap_to_segment_matches_bruteforce(spark, sf_dir):
    """Winner, snapped coords, and membership vs a Python brute force
    that replays the engine's IEEE expressions bit-for-bit (python
    floats ARE IEEE doubles, and '/', '*', math.floor are the same
    correctly-rounded ops Spark and DuckDB execute)."""
    import math

    import __spark_entry__ as em

    pts = em._box_points_u(spark, sf_dir).collect()
    segs = corpus.line_segments_a(spark, sf_dir).collect()
    got = {
        r["pt_id"]: (r["line_id"], r["sx"], r["sy"])
        for r in linejoin.snap_to_segment(
            em._box_points_u(spark, sf_dir),
            corpus.line_segments_a(spark, sf_dir),
        ).collect()
    }
    r2 = linejoin.NEAR_RADIUS_U ** 2

    def near(px, py, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        ex, ey = px - x1, py - y1
        fx, fy = px - x2, py - y2
        dd = dx * dx + dy * dy
        dot = ex * dx + ey * dy
        cross = ex * dy - ey * dx
        return (
            ex * ex + ey * ey <= r2
            or fx * fx + fy * fy <= r2
            or (0 <= dot <= dd and cross * cross <= r2 * dd)
        )

    def key_and_snap(px, py, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        ex, ey = px - x1, py - y1
        fx, fy = px - x2, py - y2
        dd = dx * dx + dy * dy
        dot = ex * dx + ey * dy
        if dot <= 0:
            return float(ex * ex + ey * ey), x1, y1
        if dot >= dd:
            return float(fx * fx + fy * fy), x2, y2
        cross = ex * dy - ey * dx
        key = float(cross * cross) / float(dd)
        sx = x1 + math.floor(float(dot * dx) / float(dd))
        sy = y1 + math.floor(float(dot * dy) / float(dd))
        return key, sx, sy

    exp = {}
    for p in pts:
        best = None
        for s in segs:
            args = (p["x"], p["y"], s["x1"], s["y1"], s["x2"], s["y2"])
            if not near(*args):
                continue
            key, sx, sy = key_and_snap(*args)
            cand = (key, s["line_id"], sx, sy)
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is not None:
            exp[p["pt_id"]] = (best[1], best[2], best[3])
    assert got == exp
    assert got, "corpus should produce snaps at test SF"


def test_snap_points_lie_on_segment_bbox(spark, sf_dir):
    import __spark_entry__ as em

    segs = {
        r["line_id"]: r
        for r in corpus.line_segments_a(spark, sf_dir).collect()
    }
    rows = linejoin.snap_to_segment(
        em._box_points_u(spark, sf_dir),
        corpus.line_segments_a(spark, sf_dir),
    ).collect()
    for r in rows:
        s = segs[r["line_id"]]
        assert min(s["x1"], s["x2"]) <= r["sx"] <= max(s["x1"], s["x2"])
        assert min(s["y1"], s["y2"]) <= r["sy"] <= max(s["y1"], s["y2"])
