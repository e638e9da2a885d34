"""Property-based assurance for the round-5 geometry kernels (pure
Python level — no Spark session, so hundreds of cases run in
seconds):

- WKT round-trip: random integer-lattice geometries -> canonical WKT
  text -> parse_wkt_text -> the same coordinates (and the parsed
  flat struct re-encodes to the identical string via the same
  formatting rules format_wkt implements).
- Segment supercover: random segments vs the Fraction-exact
  Liang-Barsky mirror from test_round5d.
"""

from fractions import Fraction
import math

from hypothesis import given, settings, strategies as st

from geo_import_spark.sources.wkt import parse_wkt_text

coord = st.integers(min_value=-999_999, max_value=999_999)
point = st.tuples(coord, coord)


def _fmt_pos(p):
    return f"{p[0]} {p[1]}"


def _ring(points):
    return "(" + ", ".join(_fmt_pos(p) for p in points) + ")"


closed_ring = st.lists(point, min_size=3, max_size=8).map(
    lambda ps: ps + [ps[0]]
)


@given(point)
@settings(max_examples=200, deadline=None)
def test_point_roundtrip(p):
    g, coords = parse_wkt_text(f"POINT ({_fmt_pos(p)})")
    assert g == "Point" and coords == [float(p[0]), float(p[1])]


@given(st.lists(point, min_size=2, max_size=10))
@settings(max_examples=200, deadline=None)
def test_linestring_roundtrip(ps):
    txt = "LINESTRING (" + ", ".join(_fmt_pos(p) for p in ps) + ")"
    g, coords = parse_wkt_text(txt)
    assert g == "LineString"
    assert coords == [[float(x), float(y)] for x, y in ps]


@given(st.lists(closed_ring, min_size=1, max_size=4))
@settings(max_examples=150, deadline=None)
def test_polygon_roundtrip(rings):
    txt = "POLYGON (" + ", ".join(_ring(r) for r in rings) + ")"
    g, coords = parse_wkt_text(txt)
    assert g == "Polygon"
    assert coords == [
        [[float(x), float(y)] for x, y in r] for r in rings
    ]


@given(st.lists(st.lists(closed_ring, min_size=1, max_size=3),
                min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_multipolygon_roundtrip(parts):
    txt = "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_ring(r) for r in rs) + ")" for rs in parts
    ) + ")"
    g, coords = parse_wkt_text(txt)
    assert g == "MultiPolygon"
    assert coords == [
        [[[float(x), float(y)] for x, y in r] for r in rs]
        for rs in parts
    ]


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_arbitrary_text_never_crashes_differently(txt):
    # the parser's only failure mode is ValueError (-> error row);
    # any other exception type would crash the task
    try:
        parse_wkt_text(txt)
    except ValueError:
        pass


# --- supercover property vs the Fraction mirror ----------------------------


def _supercover_fraction(x1, y1, x2, y2, g):
    cells = set()
    cx0, cx1 = sorted((math.floor(x1 / g), math.floor(x2 / g)))
    cy0, cy1 = sorted((math.floor(y1 / g), math.floor(y2 / g)))
    dx, dy = x2 - x1, y2 - y1
    for cx in range(cx0, cx1 + 1):
        for cy in range(cy0, cy1 + 1):
            gx0, gx1 = cx * g, (cx + 1) * g
            gy0, gy1 = cy * g, (cy + 1) * g
            if (gx0 <= x1 <= gx1 and gy0 <= y1 <= gy1) or (
                gx0 <= x2 <= gx1 and gy0 <= y2 <= gy1
            ):
                cells.add((cx, cy))
                continue
            t0, t1 = Fraction(0), Fraction(1)
            ok = True
            for p, q in ((-dx, x1 - gx0), (dx, gx1 - x1),
                         (-dy, y1 - gy0), (dy, gy1 - y1)):
                if p == 0:
                    if q < 0:
                        ok = False
                        break
                else:
                    r = Fraction(q, p)
                    if p < 0:
                        t0 = max(t0, r)
                    else:
                        t1 = min(t1, r)
            if ok and t0 <= t1:
                cells.add((cx, cy))
    return cells


def _pred_supercover(x1, y1, x2, y2, g):
    """The engine's predicate form (endpoint-inside OR crosses a cell
    edge) evaluated in pure integer arithmetic — the same logic the
    Spark expression runs."""
    def cross(px1, py1, px2, py2, qx, qy):
        return (px2 - px1) * (qy - py1) - (py2 - py1) * (qx - px1)

    def on_seg(px1, py1, px2, py2, qx, qy):
        return (min(px1, px2) <= qx <= max(px1, px2)
                and min(py1, py2) <= qy <= max(py1, py2))

    def seg_intersect(a, b):
        (ax1, ay1), (ax2, ay2) = a
        (bx1, by1), (bx2, by2) = b
        d1 = cross(bx1, by1, bx2, by2, ax1, ay1)
        d2 = cross(bx1, by1, bx2, by2, ax2, ay2)
        d3 = cross(ax1, ay1, ax2, ay2, bx1, by1)
        d4 = cross(ax1, ay1, ax2, ay2, bx2, by2)
        if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
            (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
        ):
            return True
        return (
            (d1 == 0 and on_seg(bx1, by1, bx2, by2, ax1, ay1))
            or (d2 == 0 and on_seg(bx1, by1, bx2, by2, ax2, ay2))
            or (d3 == 0 and on_seg(ax1, ay1, ax2, ay2, bx1, by1))
            or (d4 == 0 and on_seg(ax1, ay1, ax2, ay2, bx2, by2))
        )

    cells = set()
    cx0, cx1 = sorted((math.floor(x1 / g), math.floor(x2 / g)))
    cy0, cy1 = sorted((math.floor(y1 / g), math.floor(y2 / g)))
    seg = ((x1, y1), (x2, y2))
    for cx in range(cx0, cx1 + 1):
        for cy in range(cy0, cy1 + 1):
            gx0, gx1 = cx * g, (cx + 1) * g
            gy0, gy1 = cy * g, (cy + 1) * g
            if (gx0 <= x1 <= gx1 and gy0 <= y1 <= gy1) or (
                gx0 <= x2 <= gx1 and gy0 <= y2 <= gy1
            ):
                cells.add((cx, cy))
                continue
            edges = [
                ((gx0, gy0), (gx1, gy0)), ((gx0, gy1), (gx1, gy1)),
                ((gx0, gy0), (gx0, gy1)), ((gx1, gy0), (gx1, gy1)),
            ]
            if any(seg_intersect(seg, e) for e in edges):
                cells.add((cx, cy))
    return cells


segcoord = st.integers(min_value=-500, max_value=500)


@given(segcoord, segcoord, segcoord, segcoord,
       st.sampled_from([7, 16, 100]))
@settings(max_examples=400, deadline=None)
def test_supercover_predicate_equals_fraction_clip(x1, y1, x2, y2, g):
    # the predicate form the engine evaluates must agree with the
    # Fraction-exact Liang-Barsky clip on EVERY segment, including
    # degenerate points, boundary riders, and exact corner touches
    assert _pred_supercover(x1, y1, x2, y2, g) == _supercover_fraction(
        x1, y1, x2, y2, g
    )
