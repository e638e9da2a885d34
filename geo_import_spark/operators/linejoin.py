"""Line-segment intersection join: which segments of layer A intersect
which segments of layer B (touching counts), decided EXACTLY.

All coordinates are BIGINT micro-degrees, so the classic CLRS
orientation test runs in exact integer arithmetic: coordinate
differences fit 2^31, cross-product terms fit ~5.2e17 << 2^63 — no
doubles, no epsilons, no engine divergence. The predicate text is a
single template rendered for BOTH the Spark plan (F.expr) and the
DuckDB oracle, so the two sides cannot drift.

Scale shape (the same candidate-generation pattern as pip_join /
radius_join, SURVEY §4.2):
- each segment explodes into the grid cells its bbox touches (the
  corpus guarantees |dx|,|dy| < SEG_GRID, so that is at most 2x2
  cells — a map-side explode bounded by 4);
- candidate pairs come from ONE equi-join on (cx, cy) — never a cross
  join; the grid bounds candidates by local density;
- pairs sharing several cells dedup with a distinct on the pair key
  (functionally determined coords ride along);
- the exact integer predicate filters candidates JVM-side inside
  whole-stage codegen.
SEG_GRID is a power of two so the double-division floor is exact in
both engines (x <= ~2.1e6 is exactly representable; dividing by 2^17
only shifts the exponent).

Reference parity: geo-import has no segment-intersection operator —
this extends the vector-geometry family (overlay_area, dissolve_area,
nearest_poly) the north rule's spatial-join engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEG_GRID = 131072  # 2^17 micro-degrees (~0.13 deg) per cell


def _cross(px1, py1, px2, py2, qx, qy) -> str:
    """Orientation of q relative to the directed segment p1->p2
    (exact bigint cross product)."""
    return (
        f"(({px2}) - ({px1})) * (({qy}) - ({py1}))"
        f" - (({py2}) - ({py1})) * (({qx}) - ({px1}))"
    )


def _on_seg(px1, py1, px2, py2, qx, qy) -> str:
    """Given q collinear with p1-p2: is q within the segment's bbox?"""
    return (
        f"(least({px1}, {px2}) <= ({qx}) AND ({qx}) <= greatest({px1}, {px2})"
        f" AND least({py1}, {py2}) <= ({qy}) AND ({qy}) <= greatest({py1}, {py2}))"
    )


def segment_pred(ax1="ax1", ay1="ay1", ax2="ax2", ay2="ay2",
                 bx1="bx1", by1="by1", bx2="bx2", by2="by2") -> str:
    """CLRS segments-intersect predicate (inclusive of touching and
    collinear overlap) as SQL text over the given column names —
    valid Spark SQL AND DuckDB SQL."""
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (
        f"((({d1}) > 0 AND ({d2}) < 0 OR ({d1}) < 0 AND ({d2}) > 0)"
        f" AND (({d3}) > 0 AND ({d4}) < 0 OR ({d3}) < 0 AND ({d4}) > 0))"
    )
    touch = (
        f"(({d1}) = 0 AND {_on_seg(bx1, by1, bx2, by2, ax1, ay1)})"
        f" OR (({d2}) = 0 AND {_on_seg(bx1, by1, bx2, by2, ax2, ay2)})"
        f" OR (({d3}) = 0 AND {_on_seg(ax1, ay1, ax2, ay2, bx1, by1)})"
        f" OR (({d4}) = 0 AND {_on_seg(ax1, ay1, ax2, ay2, bx2, by2)})"
    )
    return f"({proper} OR {touch})"


def _cover(segments: DataFrame, prefix: str, grid: int) -> DataFrame:
    """Explode a segment frame into (cell, segment) rows — every grid
    cell the segment's bbox touches (bbox overlap is implied by
    intersection, so covers of intersecting pairs always share a
    cell)."""
    g = float(grid)
    lo = lambda a, b: F.floor(F.least(a, b) / g).cast("long")  # noqa: E731
    hi = lambda a, b: F.floor(F.greatest(a, b) / g).cast("long")  # noqa: E731
    cols = [
        F.col("line_id").alias(f"{prefix}_id"),
        F.col("x1").alias(f"{prefix}x1"),
        F.col("y1").alias(f"{prefix}y1"),
        F.col("x2").alias(f"{prefix}x2"),
        F.col("y2").alias(f"{prefix}y2"),
    ]
    return segments.select(
        *cols,
        F.explode(F.sequence(lo("x1", "x2"), hi("x1", "x2"))).alias("cx"),
    ).select(
        *[f"{prefix}_id", f"{prefix}x1", f"{prefix}y1", f"{prefix}x2",
          f"{prefix}y2", "cx"],
        F.explode(
            F.sequence(lo(f"{prefix}y1", f"{prefix}y2"),
                       hi(f"{prefix}y1", f"{prefix}y2"))
        ).alias("cy"),
    )


def segment_intersect_join(a: DataFrame, b: DataFrame,
                           grid: int = SEG_GRID) -> DataFrame:
    """All (a_id, b_id) pairs whose segments intersect (touch counts).

    Inputs: (line_id, x1, y1, x2, y2) with bigint micro-degree coords.
    One cell equi-join + one pair distinct; exact integer predicate.
    """
    ca = _cover(a, "a", grid)
    cb = _cover(b, "b", grid)
    cand = ca.join(cb, ["cx", "cy"]).select(
        "a_id", "ax1", "ay1", "ax2", "ay2",
        "b_id", "bx1", "by1", "bx2", "by2",
    ).distinct()
    return cand.filter(F.expr(segment_pred())).select("a_id", "b_id")


def proper_pred(ax1="ax1", ay1="ay1", ax2="ax2", ay2="ay2",
                bx1="bx1", by1="by1", bx2="bx2", by2="by2") -> str:
    """Strictly-proper crossing (both segments straddle the other's
    line) — the case with a unique interior intersection point."""
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
    return (
        f"((({d1}) > 0 AND ({d2}) < 0 OR ({d1}) < 0 AND ({d2}) > 0)"
        f" AND (({d3}) > 0 AND ({d4}) < 0 OR ({d3}) < 0 AND ({d4}) > 0))"
    )


def point_exprs(ax1="ax1", ay1="ay1", ax2="ax2", ay2="ay2",
                bx1="bx1", by1="by1", bx2="bx2", by2="by2") -> tuple[str, str]:
    """(ix, iy) of a proper crossing: b1 + t*(b2-b1) with
    t = d3/(d3-d4), the exact signed-area ratio. d3/d4 are exact
    bigints, so the double expression tree (one division, one
    multiply-add per axis) is engine-identical — the mirror repeats it
    verbatim and the values compare bit-exact."""
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
    t = f"(CAST(({d3}) AS DOUBLE) / CAST((({d3}) - ({d4})) AS DOUBLE))"
    ix = f"(CAST({bx1} AS DOUBLE) + {t} * CAST(({bx2}) - ({bx1}) AS DOUBLE))"
    iy = f"(CAST({by1} AS DOUBLE) + {t} * CAST(({by2}) - ({by1}) AS DOUBLE))"
    return ix, iy


def segment_intersection_points(a: DataFrame, b: DataFrame,
                                grid: int = SEG_GRID) -> DataFrame:
    """(a_id, b_id, ix, iy) for every PROPER crossing — the same
    candidate plan as segment_intersect_join with the point computed
    from the exact signed-area ratio (micro-degree doubles)."""
    ca = _cover(a, "a", grid)
    cb = _cover(b, "b", grid)
    cand = ca.join(cb, ["cx", "cy"]).select(
        "a_id", "ax1", "ay1", "ax2", "ay2",
        "b_id", "bx1", "by1", "bx2", "by2",
    ).distinct()
    ix, iy = point_exprs()
    return cand.filter(F.expr(proper_pred())).select(
        "a_id", "b_id",
        F.expr(ix).alias("ix"),
        F.expr(iy).alias("iy"),
    )


def sql_segment_intersection_points(sql_a: str, sql_b: str) -> str:
    cols = dict(
        ax1="la.x1", ay1="la.y1", ax2="la.x2", ay2="la.y2",
        bx1="lb.x1", by1="lb.y1", bx2="lb.x2", by2="lb.y2",
    )
    ix, iy = point_exprs(**cols)
    return f"""
WITH la AS ({sql_a}), lb AS ({sql_b})
SELECT la.line_id AS a_id, lb.line_id AS b_id,
       {ix} AS ix, {iy} AS iy
FROM la CROSS JOIN lb
WHERE {proper_pred(**cols)}
"""


def sql_segment_intersect(sql_a: str, sql_b: str) -> str:
    """DuckDB oracle: the same exact predicate over a direct join of
    the two layer CTEs (fine at oracle SF; the Spark plan is the one
    that must scale)."""
    pred = segment_pred(
        ax1="la.x1", ay1="la.y1", ax2="la.x2", ay2="la.y2",
        bx1="lb.x1", by1="lb.y1", bx2="lb.x2", by2="lb.y2",
    )
    return f"""
WITH la AS ({sql_a}), lb AS ({sql_b})
SELECT la.line_id AS a_id, lb.line_id AS b_id
FROM la CROSS JOIN lb
WHERE {pred}
"""


# --- Liang-Barsky segment clipping to the rectangle layer -----------------------

_D0 = "CAST(0.0 AS DOUBLE)"
_D1 = "CAST(1.0 AS DOUBLE)"
_INF = "CAST(1e308 AS DOUBLE)"


def clip_exprs(sx1="sx1", sy1="sy1", sx2="sx2", sy2="sy2",
               minx="minx", miny="miny", maxx="maxx", maxy="maxy"
               ) -> tuple[str, str]:
    """(t0, t1) Liang-Barsky clip parameters of segment s against the
    axis-aligned window, as SQL text valid in Spark AND DuckDB. The
    corpus guarantees dx <> 0 (odd micro-degree delta); dy = 0 is
    handled with an inside/outside +-inf sentinel. Clipped iff
    t0 <= t1."""
    dx = f"(({sx2}) - ({sx1}))"
    dy = f"(({sy2}) - ({sy1}))"
    tx1 = f"((({minx}) - ({sx1})) / {dx})"
    tx2 = f"((({maxx}) - ({sx1})) / {dx})"
    ty1 = f"((({miny}) - ({sy1})) / {dy})"
    ty2 = f"((({maxy}) - ({sy1})) / {dy})"
    inside_y = f"(({sy1}) >= ({miny}) AND ({sy1}) <= ({maxy}))"
    tye = (f"(CASE WHEN {dy} <> 0 THEN least({ty1}, {ty2})"
           f" ELSE CASE WHEN {inside_y} THEN -{_INF} ELSE {_INF} END END)")
    tyx = (f"(CASE WHEN {dy} <> 0 THEN greatest({ty1}, {ty2})"
           f" ELSE CASE WHEN {inside_y} THEN {_INF} ELSE -{_INF} END END)")
    t0 = f"greatest(least({tx1}, {tx2}), {tye}, {_D0})"
    t1 = f"least(greatest({tx1}, {tx2}), {tyx}, {_D1})"
    return t0, t1


def clip_segments(segments: DataFrame, polygons: DataFrame) -> DataFrame:
    """Clip every layer-A segment to every rectangle polygon it
    crosses (Liang-Barsky): (a_id, poly_id, cx1, cy1, cx2, cy2) in
    degrees, one row per non-empty clip.

    Plan: the polygon side is dimension-sized and BROADCASTS; the bbox
    overlap prefilter is fused into the (non-equi) broadcast join so
    the per-segment work is bounded by overlapping rectangles, and the
    clip parameters are pure whole-stage-codegen doubles — zero
    shuffles on the segment side. Every t/endpoint expression tree is
    shared verbatim with the mirror (clip_exprs), so the emitted
    coordinates compare bit-exact.
    """
    s = segments.select(
        "line_id",
        (F.col("x1") / 1000000.0).alias("sx1"),
        (F.col("y1") / 1000000.0).alias("sy1"),
        (F.col("x2") / 1000000.0).alias("sx2"),
        (F.col("y2") / 1000000.0).alias("sy2"),
    )
    p = polygons.select("poly_id", "minx", "miny", "maxx", "maxy")
    overlap = (
        (F.col("minx") <= F.greatest("sx1", "sx2"))
        & (F.col("maxx") >= F.least("sx1", "sx2"))
        & (F.col("miny") <= F.greatest("sy1", "sy2"))
        & (F.col("maxy") >= F.least("sy1", "sy2"))
    )
    t0, t1 = clip_exprs()
    j = s.join(F.broadcast(p), overlap)
    return j.filter(F.expr(f"{t0} <= {t1}")).select(
        F.col("line_id").alias("a_id"),
        "poly_id",
        F.expr(f"sx1 + {t0} * (sx2 - sx1)").alias("cx1"),
        F.expr(f"sy1 + {t0} * (sy2 - sy1)").alias("cy1"),
        F.expr(f"sx1 + {t1} * (sx2 - sx1)").alias("cx2"),
        F.expr(f"sy1 + {t1} * (sy2 - sy1)").alias("cy2"),
    )


def sql_clip_segments(sql_segments: str, sql_polygons: str) -> str:
    t0, t1 = clip_exprs()
    return f"""
WITH seg AS ({sql_segments}),
s AS (
  SELECT line_id, x1 / 1000000.0 AS sx1, y1 / 1000000.0 AS sy1,
         x2 / 1000000.0 AS sx2, y2 / 1000000.0 AS sy2
  FROM seg
),
p AS ({sql_polygons})
SELECT line_id AS a_id, poly_id,
       sx1 + {t0} * (sx2 - sx1) AS cx1,
       sy1 + {t0} * (sy2 - sy1) AS cy1,
       sx1 + {t1} * (sx2 - sx1) AS cx2,
       sy1 + {t1} * (sy2 - sy1) AS cy2
FROM s CROSS JOIN p
WHERE {t0} <= {t1}
"""


# --- point-near-segment join (points within R of a polyline segment) -------------

NEAR_RADIUS_U = 20_000  # 0.02 degrees in micro-degrees; < SEG_GRID


def _near_pred(wide_sq, px="px", py="py", x1="x1", y1="y1",
               x2="x2", y2="y2") -> str:
    """Exact 'point within R of segment' predicate over the named
    columns with R = NEAR_RADIUS_U micro-degrees.

    Endpoint tests and the projection-interval test fit int64; the
    perpendicular test compares cross^2 <= R^2 * |d|^2 where cross can
    reach ~6e10 (cross^2 ~ 3.6e21), so `wide_sq` renders the squaring
    in a 128-bit-capable type per engine (DECIMAL(38,0) in Spark,
    HUGEINT in DuckDB) — different spelling, identical integer values,
    identical boolean."""
    r2 = NEAR_RADIUS_U * NEAR_RADIUS_U
    dx, dy = f"({x2} - {x1})", f"({y2} - {y1})"
    ex, ey = f"({px} - {x1})", f"({py} - {y1})"
    fx, fy = f"({px} - {x2})", f"({py} - {y2})"
    d2 = f"({dx}*{dx} + {dy}*{dy})"
    dot = f"({ex}*{dx} + {ey}*{dy})"
    cross = f"({ex}*{dy} - {ey}*{dx})"
    e1 = f"({ex}*{ex} + {ey}*{ey} <= {r2})"
    e2 = f"({fx}*{fx} + {fy}*{fy} <= {r2})"
    perp = (
        f"({dot} >= 0 AND {dot} <= {d2}"
        f" AND {wide_sq.format(x=cross)} <= {r2} * {d2})"
    )
    return f"({e1} OR {e2} OR {perp})"


_WIDE_SPARK = "CAST({x} AS DECIMAL(38, 0)) * CAST({x} AS DECIMAL(38, 0))"
_WIDE_DUCK = "CAST({x} AS HUGEINT) * CAST({x} AS HUGEINT)"

NEAR_PRED_SPARK = _near_pred(_WIDE_SPARK)


def near_segment_join(points_u: DataFrame, segments: DataFrame,
                      grid: int = SEG_GRID) -> DataFrame:
    """(pt_id, line_id) for every point within NEAR_RADIUS_U of a
    segment — the 'points near roads' join.

    Plan: each point hashes to exactly ONE grid cell (a pure map);
    each segment's bbox inflates by R and covers a handful of cells
    (bounded map-side explode, R < grid). The candidate join is ONE
    cell equi-join, and because the point side contributes a single
    cell per point, every (point, segment) pair appears at most once —
    no dedup shuffle. The exact integer distance predicate then
    filters JVM-side (one DECIMAL-widened square for the perpendicular
    term; everything else int64).

    points_u: (pt_id, x, y) bigint micro-degrees.
    """
    g = float(grid)
    r = NEAR_RADIUS_U
    pc = points_u.select(
        "pt_id",
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.floor(F.col("x") / g).cast("long").alias("cx"),
        F.floor(F.col("y") / g).cast("long").alias("cy"),
    )
    lo = lambda a, b: F.floor((F.least(a, b) - r) / g).cast("long")  # noqa: E731
    hi = lambda a, b: F.floor((F.greatest(a, b) + r) / g).cast("long")  # noqa: E731
    sc = segments.select(
        "line_id", "x1", "y1", "x2", "y2",
        F.explode(F.sequence(lo("x1", "x2"), hi("x1", "x2"))).alias("cx"),
    ).select(
        "line_id", "x1", "y1", "x2", "y2", "cx",
        F.explode(F.sequence(lo("y1", "y2"), hi("y1", "y2"))).alias("cy"),
    )
    cand = pc.join(sc, ["cx", "cy"])
    return cand.filter(F.expr(NEAR_PRED_SPARK)).select("pt_id", "line_id")


def sql_near_segment_join(sql_points_u: str, sql_segments: str) -> str:
    """Oracle: the exact predicate over a direct join (HUGEINT square)."""
    pred = _near_pred(
        _WIDE_DUCK, px="p.x", py="p.y",
        x1="s.x1", y1="s.y1", x2="s.x2", y2="s.y2",
    )
    return f"""
WITH p AS ({sql_points_u}), s AS ({sql_segments})
SELECT p.pt_id AS pt_id, s.line_id AS line_id
FROM p CROSS JOIN s
WHERE {pred}
"""


# ---------------------------------------------------------------------------
# Snap-to-segment (map matching): each point within NEAR_RADIUS_U of any
# segment snaps to its NEAREST segment's closest point.
# ---------------------------------------------------------------------------

def _snap_exprs(wide_sq, floorcast, px="px", py="py", x1="x1", y1="y1",
                x2="x2", y2="y2") -> dict:
    """SQL expression strings for the snap: `dist_key` (double ranking
    key — the exact squared point-segment distance, scaled identically
    on both engines) and the snapped coordinates `sx`, `sy`.

    Determinism: dot, d2 and the endpoint squares are exact int64
    (candidate offsets <= grid + |d| + R ~ 2.5e5, so dot <= 5e10 and
    dot*dx <= 5e15 < 2^53 — exactly representable doubles). cross^2
    can reach ~2.5e21, so `wide_sq` squares it in a 128-bit type
    (DECIMAL(38,0) / HUGEINT) whose -> double conversion is correctly
    rounded in both engines. Every exposed value is then ONE identical
    closed-form IEEE expression per engine — floor-of-rounded-quotient
    included, which need not be the true floor but is bit-identical
    across engines (the only contract that matters).
    """
    dx, dy = f"(({x2}) - ({x1}))", f"(({y2}) - ({y1}))"
    ex, ey = f"(({px}) - ({x1}))", f"(({py}) - ({y1}))"
    fx, fy = f"(({px}) - ({x2}))", f"(({py}) - ({y2}))"
    d2 = f"({dx}*{dx} + {dy}*{dy})"
    dot = f"({ex}*{dx} + {ey}*{dy})"
    cross = f"({ex}*{dy} - {ey}*{dx})"
    dist_key = (
        f"CASE WHEN {dot} <= 0 THEN CAST({ex}*{ex} + {ey}*{ey} AS DOUBLE)"
        f" WHEN {dot} >= {d2} THEN CAST({fx}*{fx} + {fy}*{fy} AS DOUBLE)"
        f" ELSE CAST({wide_sq.format(x=cross)} AS DOUBLE)"
        f" / CAST({d2} AS DOUBLE) END"
    )
    def snap(a1, a2, da):
        interp = floorcast.format(
            v=f"CAST({dot}*{da} AS DOUBLE) / CAST({d2} AS DOUBLE)"
        )
        return (
            f"CASE WHEN {dot} <= 0 THEN {a1}"
            f" WHEN {dot} >= {d2} THEN {a2}"
            f" ELSE {a1} + {interp} END"
        )
    return {
        "dist_key": dist_key,
        "sx": snap(x1, x2, dx),
        "sy": snap(y1, y2, dy),
    }


_FLOOR_SPARK = "FLOOR({v})"
_FLOOR_DUCK = "CAST(floor({v}) AS BIGINT)"


def snap_to_segment(points_u: DataFrame, segments: DataFrame,
                    grid: int = SEG_GRID) -> DataFrame:
    """(pt_id, line_id, sx, sy): each point within NEAR_RADIUS_U of any
    segment, snapped to the closest point of its NEAREST segment.

    Plan: the same single cell equi-join as near_segment_join generates
    candidates (point maps to ONE cell; the R-inflated segment bbox
    explodes into a bounded handful), the exact near predicate filters
    JVM-side, and one window on pt_id picks the min-distance segment
    (ties broken by line_id — a total order, so the winner is unique
    and the hash contract deterministic). Two shuffles total: the cell
    join and the per-point window — both keyed, both AQE-coalesced; no
    per-row Python anywhere.
    """
    g = float(grid)
    r = NEAR_RADIUS_U
    pc = points_u.select(
        "pt_id",
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.floor(F.col("x") / g).cast("long").alias("cx"),
        F.floor(F.col("y") / g).cast("long").alias("cy"),
    )
    lo = lambda a, b: F.floor((F.least(a, b) - r) / g).cast("long")  # noqa: E731
    hi = lambda a, b: F.floor((F.greatest(a, b) + r) / g).cast("long")  # noqa: E731
    sc = segments.select(
        "line_id", "x1", "y1", "x2", "y2",
        F.explode(F.sequence(lo("x1", "x2"), hi("x1", "x2"))).alias("cx"),
    ).select(
        "line_id", "x1", "y1", "x2", "y2", "cx",
        F.explode(F.sequence(lo("y1", "y2"), hi("y1", "y2"))).alias("cy"),
    )
    e = _snap_exprs(_WIDE_SPARK, _FLOOR_SPARK)
    cand = (
        pc.join(sc, ["cx", "cy"])
        .filter(F.expr(NEAR_PRED_SPARK))
        .select(
            "pt_id", "line_id",
            F.expr(e["dist_key"]).alias("dist_key"),
            F.expr(e["sx"]).alias("sx"),
            F.expr(e["sy"]).alias("sy"),
        )
    )
    w = Window.partitionBy("pt_id").orderBy("dist_key", "line_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pt_id", "line_id", "sx", "sy")
    )


def sql_snap_to_segment(sql_points_u: str, sql_segments: str) -> str:
    """Oracle: exact predicate over a direct join, identical snap
    expressions (HUGEINT square), same (dist_key, line_id) tiebreak."""
    kw = dict(px="p.x", py="p.y", x1="s.x1", y1="s.y1",
              x2="s.x2", y2="s.y2")
    pred = _near_pred(_WIDE_DUCK, **kw)
    e = _snap_exprs(_WIDE_DUCK, _FLOOR_DUCK, **kw)
    return f"""
WITH p AS ({sql_points_u}), s AS ({sql_segments}),
cand AS (
  SELECT p.pt_id AS pt_id, s.line_id AS line_id,
         {e['dist_key']} AS dist_key,
         {e['sx']} AS sx, {e['sy']} AS sy
  FROM p CROSS JOIN s
  WHERE {pred}
)
SELECT pt_id, line_id, sx, sy
FROM (SELECT *, row_number() OVER (PARTITION BY pt_id
                                   ORDER BY dist_key, line_id) AS rn
      FROM cand)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Corridor join: points within R of ANY segment of a multi-segment path
# ---------------------------------------------------------------------------

N_PATHS = 4


def corridor_join(points_u: DataFrame, segments: DataFrame,
                  grid: int = SEG_GRID) -> DataFrame:
    """(pt_id, path_id) for every point within NEAR_RADIUS_U of any
    segment of a path — the 'points along a route' join, where a path
    is a bundle of segments (here line la-k belongs to path k % 4,
    derivable from the id on both engines).

    Plan: the near join's single cell equi-join + exact predicate
    produces (pt, segment) hits; the path id is a pure projection of
    line_id (no second table), and ONE distinct on (pt_id, path_id)
    collapses multi-segment hits — the only added shuffle, keyed and
    map-side-combined.
    """
    near = near_segment_join(points_u, segments, grid)
    return near.select(
        "pt_id",
        (F.regexp_extract("line_id", r"(\d+)$", 1).cast("long")
         % N_PATHS).alias("path_id"),
    ).distinct()


def sql_corridor_join(sql_points_u: str, sql_segments: str) -> str:
    pred = _near_pred(
        _WIDE_DUCK, px="p.x", py="p.y",
        x1="s.x1", y1="s.y1", x2="s.x2", y2="s.y2",
    )
    return f"""
WITH p AS ({sql_points_u}), s AS ({sql_segments})
SELECT DISTINCT p.pt_id AS pt_id,
       CAST(regexp_extract(s.line_id, '(\\d+)$', 1) AS BIGINT)
         % {N_PATHS} AS path_id
FROM p CROSS JOIN s
WHERE {pred}
"""


# ---------------------------------------------------------------------------
# Exact segment rasterization (supercover): cells a segment crosses
# ---------------------------------------------------------------------------


def segment_raster_cells(segments: DataFrame,
                         grid: int = SEG_GRID) -> DataFrame:
    """Every grid cell a segment actually CROSSES (touch counts) —
    the exact supercover a telemetry pipeline uses to rasterize GPS
    tracks onto tiles. The bbox cover is a superset (a diagonal
    segment's bbox touches cells the line misses); each candidate
    cell is then decided exactly: an endpoint inside the closed cell,
    or the segment intersects one of the 4 cell edges — all integer
    CLRS predicates (the segment_intersect machinery, shared
    verbatim with the mirror).

    Plan: a pure bounded explode (the bbox cover) + one wide
    projection evaluating the 5 predicates in whole-stage codegen —
    zero joins, zero shuffles, no Python; composes downstream with
    tile counts without touching the segment table again.

    Output: (line_id, cx, cy), one row per crossed cell.
    """
    g = int(grid)
    cov = _cover(segments, "s", g)
    c = (
        cov.withColumn("gx0", F.col("cx") * g)
        .withColumn("gx1", (F.col("cx") + 1) * g)
        .withColumn("gy0", F.col("cy") * g)
        .withColumn("gy1", (F.col("cy") + 1) * g)
    )
    inside = (
        "(gx0 <= sx1 AND sx1 <= gx1 AND gy0 <= sy1 AND sy1 <= gy1)"
        " OR (gx0 <= sx2 AND sx2 <= gx1 AND gy0 <= sy2 AND sy2 <= gy1)"
    )
    seg = dict(ax1="sx1", ay1="sy1", ax2="sx2", ay2="sy2")
    edges = [
        dict(bx1="gx0", by1="gy0", bx2="gx1", by2="gy0"),  # bottom
        dict(bx1="gx0", by1="gy1", bx2="gx1", by2="gy1"),  # top
        dict(bx1="gx0", by1="gy0", bx2="gx0", by2="gy1"),  # left
        dict(bx1="gx1", by1="gy0", bx2="gx1", by2="gy1"),  # right
    ]
    crosses = " OR ".join(segment_pred(**seg, **e) for e in edges)
    return (
        c.filter(F.expr(f"({inside}) OR {crosses}"))
        .select(F.col("s_id").alias("line_id"), "cx", "cy")
    )


def sql_segment_raster_cells(sql_segments: str,
                             grid: int = SEG_GRID) -> str:
    """Mirror: generate_series bbox cover + the identical inside/
    edge-crossing predicate text."""
    g = int(grid)
    seg = dict(ax1="sx1", ay1="sy1", ax2="sx2", ay2="sy2")
    edges = [
        dict(bx1="gx0", by1="gy0", bx2="gx1", by2="gy0"),
        dict(bx1="gx0", by1="gy1", bx2="gx1", by2="gy1"),
        dict(bx1="gx0", by1="gy0", bx2="gx0", by2="gy1"),
        dict(bx1="gx1", by1="gy0", bx2="gx1", by2="gy1"),
    ]
    crosses = " OR ".join(segment_pred(**seg, **e) for e in edges)
    inside = (
        "(gx0 <= sx1 AND sx1 <= gx1 AND gy0 <= sy1 AND sy1 <= gy1)"
        " OR (gx0 <= sx2 AND sx2 <= gx1 AND gy0 <= sy2 AND sy2 <= gy1)"
    )
    return f"""
WITH seg AS ({sql_segments}),
s AS (
  SELECT line_id, x1 AS sx1, y1 AS sy1, x2 AS sx2, y2 AS sy2,
         CAST(floor(LEAST(x1, x2) / {g}.0) AS BIGINT) AS cx0,
         CAST(floor(GREATEST(x1, x2) / {g}.0) AS BIGINT) AS cx1,
         CAST(floor(LEAST(y1, y2) / {g}.0) AS BIGINT) AS cy0,
         CAST(floor(GREATEST(y1, y2) / {g}.0) AS BIGINT) AS cy1
  FROM seg
),
cx AS (SELECT s.*, unnest(generate_series(cx0, cx1)) AS cx FROM s),
cov AS (SELECT cx.*, unnest(generate_series(cy0, cy1)) AS cy FROM cx),
c AS (
  SELECT line_id, sx1, sy1, sx2, sy2, cx, cy,
         cx * {g} AS gx0, (cx + 1) * {g} AS gx1,
         cy * {g} AS gy0, (cy + 1) * {g} AS gy1
  FROM cov
)
SELECT line_id, cx, cy FROM c
WHERE ({inside}) OR {crosses}
"""
