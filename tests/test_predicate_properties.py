"""Property-based checks (hypothesis) of the shared SQL predicate
templates in linejoin.py, evaluated in DuckDB against exact Fraction
arithmetic — validates the template logic itself over adversarial
integer inputs (collinear, touching, degenerate-adjacent), far beyond
the corpus distribution."""

from fractions import Fraction

import duckdb
from hypothesis import given, settings, strategies as st

from geo_import_spark.operators import linejoin

coord = st.integers(min_value=-50, max_value=50)


def _seg_intersects_exact(a1, a2, b1, b2):
    def cross(p1, p2, q):
        return (p2[0] - p1[0]) * (q[1] - p1[1]) - (p2[1] - p1[1]) * (
            q[0] - p1[0]
        )

    def onseg(p1, p2, q):
        return (
            min(p1[0], p2[0]) <= q[0] <= max(p1[0], p2[0])
            and min(p1[1], p2[1]) <= q[1] <= max(p1[1], p2[1])
        )

    d1, d2 = cross(b1, b2, a1), cross(b1, b2, a2)
    d3, d4 = cross(a1, a2, b1), cross(a1, a2, b2)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    return (
        (d1 == 0 and onseg(b1, b2, a1))
        or (d2 == 0 and onseg(b1, b2, a2))
        or (d3 == 0 and onseg(a1, a2, b1))
        or (d4 == 0 and onseg(a1, a2, b2))
    )


_CON = duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(coord, coord, coord, coord, coord, coord, coord, coord)
def test_segment_pred_matches_exact(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    pred = linejoin.segment_pred()
    got = _CON.sql(
        f"SELECT {pred} FROM (SELECT {ax1} ax1, {ay1} ay1, {ax2} ax2,"
        f" {ay2} ay2, {bx1} bx1, {by1} by1, {bx2} bx2, {by2} by2)"
    ).fetchone()[0]
    exp = _seg_intersects_exact(
        (ax1, ay1), (ax2, ay2), (bx1, by1), (bx2, by2)
    )
    assert bool(got) == exp


@settings(max_examples=300, deadline=None)
@given(coord, coord, coord, coord, coord, coord, coord, coord)
def test_proper_crossing_point_is_exact(ax1, ay1, ax2, ay2,
                                        bx1, by1, bx2, by2):
    """Whenever proper_pred fires, the emitted point equals the exact
    rational intersection within double error of the expression."""
    pred = linejoin.proper_pred()
    ix, iy = linejoin.point_exprs()
    row = _CON.sql(
        f"SELECT {pred}, {ix}, {iy} FROM (SELECT {ax1} ax1, {ay1} ay1,"
        f" {ax2} ax2, {ay2} ay2, {bx1} bx1, {by1} by1, {bx2} bx2, {by2} by2)"
    ).fetchone()
    if not row[0]:
        return
    # exact rational: b1 + t*(b2-b1), t = d3/(d3-d4)
    def cross(p1, p2, q):
        return (p2[0] - p1[0]) * (q[1] - p1[1]) - (p2[1] - p1[1]) * (
            q[0] - p1[0]
        )

    d3 = cross((ax1, ay1), (ax2, ay2), (bx1, by1))
    d4 = cross((ax1, ay1), (ax2, ay2), (bx2, by2))
    t = Fraction(d3, d3 - d4)
    ex = Fraction(bx1) + t * (bx2 - bx1)
    ey = Fraction(by1) + t * (by2 - by1)
    assert abs(row[1] - float(ex)) <= 1e-9 * max(1.0, abs(float(ex)))
    assert abs(row[2] - float(ey)) <= 1e-9 * max(1.0, abs(float(ey)))
    assert 0 < t < 1
