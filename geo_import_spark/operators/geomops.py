"""Computational-geometry operators: per-group convex hull and
Douglas–Peucker polyline simplification.

Both are iterative algorithms Spark's expression language can't
express, so they run as Arrow-batched pandas UDFs — with the hull
shaped as a MERGEABLE two-level aggregate (the property that makes it
work at 100 TB):

  hull(S1 ∪ S2) = hull(hull(S1) ∪ hull(S2))

Level 1 computes a hull per (group, input partition) inside
`applyInPandas` over the mapped-in batches; level 2 re-hulls the
concatenated partial hulls per group. The shuffle after level 1
carries only hull VERTICES (bounded by the partial hulls' sizes, not
the point count) — the same partial-aggregate shape as a map-side
combine.

Both now carry hash-checked DuckDB oracles (VERDICT r3 #1) in
addition to the property tests (tests/test_geomops.py: every input
point lies inside the hull, hull vertices are input points, DP keeps
endpoints and is idempotent, epsilon=0 only drops exactly-collinear
vertices):

- `sql_convex_hull` mirrors the hull WITHOUT recursion: on the
  µdeg integer lattice, (a, b) is a CCW hull edge iff every other
  point is strictly left of a→b or lies on the closed segment — an
  exact-int64 edge-counting test. An Akl–Toussaint octagon prefilter
  (extremes of x, y, x+y, x−y per group; hull vertices always
  survive it, so the witness set stays complete) keeps the O(c³)
  edge scan on a boundary-shell-sized candidate set.
- `sql_simplify_ring7` mirrors Douglas–Peucker as a recursive CTE:
  each interval finds its max-distance vertex (row_number tie-break =
  np.argmax's first-max) and splits when d > ε; kept vertices are the
  distinct interval endpoints. The distance CASE is the same
  expression tree as `_dp_mask` (within-interval argmax ordering is
  denominator-free, so hypot-vs-sqrt ULPs can't reorder it).

Reference parity: geo-import has no hull/simplify (its geometry ops
are fixers — linify/close-rings, es6-lib/decoders/transform.js);
these extend the engine's geometry toolbox.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _akl_toussaint_keep(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Indices surviving the Akl–Toussaint prefilter: points strictly
    inside the octagon spanned by the 8 directional extremes (min/max
    of x, y, x+y, x-y) can never be hull vertices, and the
    strictly-inside test is one vectorized pass — the sequential
    Python chain then only walks the (tiny) boundary shell."""
    s, d = xs + ys, xs - ys
    ext = np.unique(
        np.array(
            [
                np.argmin(xs), np.argmax(xs),
                np.argmin(ys), np.argmax(ys),
                np.argmin(s), np.argmax(s),
                np.argmin(d), np.argmax(d),
            ]
        )
    )
    px, py = xs[ext], ys[ext]
    # order the extreme points CCW around their centroid to form the
    # discard polygon
    ang = np.arctan2(py - py.mean(), px - px.mean())
    ext = ext[np.argsort(ang)]
    px, py = xs[ext], ys[ext]
    if len(ext) < 3:
        return np.arange(len(xs))
    inside = np.ones(len(xs), dtype=bool)
    for i in range(len(ext)):
        ax, ay = px[i], py[i]
        bx, by = px[(i + 1) % len(ext)], py[(i + 1) % len(ext)]
        # strictly-left of every CCW edge = strictly inside
        inside &= (bx - ax) * (ys - ay) - (by - ay) * (xs - ax) > 0
    return np.nonzero(~inside)[0]


def _hull_indices(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns indices of hull vertices in
    CCW order starting at the lexicographic minimum. Collinear edge
    points are dropped (strict turns only). Large inputs are first
    thinned with the Akl–Toussaint octagon (exact, vectorized) so the
    Python chain loop is O(shell), not O(n)."""
    n = len(xs)
    if n <= 2:
        return np.arange(n)
    if n > 64:
        keep = _akl_toussaint_keep(xs, ys)
        if len(keep) < n:  # degenerate shells keep everything: no recursion
            sub = _hull_indices(xs[keep], ys[keep])
            return keep[sub]
    order = np.lexsort((ys, xs))
    pts = np.stack([xs[order], ys[order]], axis=1)

    def chain(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                o, a = pts[out[-2]], pts[out[-1]]
                if (a[0] - o[0]) * (pts[i][1] - o[1]) - (a[1] - o[1]) * (
                    pts[i][0] - o[0]
                ) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(len(pts)))
    upper = chain(range(len(pts) - 1, -1, -1))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # all collinear: keep the two extremes
        hull = [lower[0], lower[-1]]
    return order[np.array(hull)]


_HULL_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ]
)


def _hull_of_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for g, sub in pdf.groupby("group_key", sort=False):
        xs = sub["lon"].values.astype(np.float64)
        ys = sub["lat"].values.astype(np.float64)
        # Integral inputs (e.g. µdeg-lattice coordinates) switch the
        # whole hull to exact int64 arithmetic: float64 cross products
        # of µdeg coords reach ~6e16 > 2^53 and can flip sign on
        # near-collinear triples, while int64 crosses (< 2.6e17) are
        # exact — this is what makes the hull hash-comparable to the
        # integer-predicate DuckDB oracle.
        if (
            len(xs)
            and np.all(np.isfinite(xs))
            and np.all(np.isfinite(ys))
            and np.all(xs == np.rint(xs))
            and np.all(ys == np.rint(ys))
            and np.abs(xs).max() < 2**53
            and np.abs(ys).max() < 2**53
        ):
            xs = xs.astype(np.int64)
            ys = ys.astype(np.int64)
        idx = _hull_indices(xs, ys)
        out.append(
            {
                "group_key": g,
                "xs": xs[idx].astype(np.float64).tolist(),
                "ys": ys[idx].astype(np.float64).tolist(),
            }
        )
    return pd.DataFrame(out, columns=["group_key", "xs", "ys"])


def convex_hull(points: DataFrame, group_col: str = "layer_id") -> DataFrame:
    """Convex hull per group over (lon, lat) points.

    Two-level mergeable aggregate (see module doc): partial hulls per
    input partition via mapInPandas (no shuffle), then one shuffle of
    hull vertices only, then the final hull per group.

    Output: (group_col, n_hull, hull_xs, hull_ys, hull_area) with the
    ring in CCW order from the lexicographic minimum vertex.
    """
    src = points.select(
        F.col(group_col).cast("string").alias("group_key"), "lon", "lat"
    )

    def partial(iterator):
        for pdf in iterator:
            if len(pdf):
                yield _hull_of_frame(pdf)

    partials = src.mapInPandas(partial, _HULL_SCHEMA)
    exploded = partials.select(
        "group_key", F.explode(F.arrays_zip("xs", "ys")).alias("p")
    ).select("group_key", F.col("p.xs").alias("lon"), F.col("p.ys").alias("lat"))

    final = exploded.groupBy("group_key").applyInPandas(
        lambda pdf: _hull_of_frame(pdf), _HULL_SCHEMA
    )
    area = F.aggregate(
        F.sequence(F.lit(0), F.size("xs") - 1),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.col("xs"), j + 1)
        * F.element_at(F.col("ys"), (j + 1) % F.size("ys") + 1)
        - F.element_at(F.col("xs"), (j + 1) % F.size("xs") + 1)
        * F.element_at(F.col("ys"), j + 1),
    ) / 2.0
    return final.select(
        F.col("group_key").alias(group_col),
        F.size("xs").alias("n_hull"),
        F.col("xs").alias("hull_xs"),
        F.col("ys").alias("hull_ys"),
        F.when(F.size("xs") >= 3, F.abs(area)).otherwise(F.lit(0.0)).alias("hull_area"),
    )


def _dp_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Douglas–Peucker keep-mask, iterative stack form."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        seg = np.hypot(dx, dy)
        px = xs[i + 1 : j]
        py = ys[i + 1 : j]
        if seg == 0.0:
            d = np.hypot(px - xs[i], py - ys[i])
        else:
            d = np.abs(dx * (py - ys[i]) - dy * (px - xs[i])) / seg
        m = int(np.argmax(d))
        if d[m] > eps:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_lines(lines: DataFrame, epsilon: float,
                   id_col: str = "line_id") -> DataFrame:
    """Douglas–Peucker simplification of polylines given as parallel
    xs/ys array columns: drop vertices within `epsilon` perpendicular
    distance of the kept chain. Endpoints always survive; the result
    is a subsequence of the input ring, so repeated application is a
    fixpoint (idempotence — tested).

    One Arrow-batched pandas UDF per row (O(vertices log vertices)
    typical), no shuffle: simplification is embarrassingly parallel
    over lines.

    Output: (id_col, xs, ys, n_in, n_out).
    """
    eps = float(epsilon)

    def simp(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                xs = np.asarray(r["xs"], dtype=np.float64)
                ys = np.asarray(r["ys"], dtype=np.float64)
                if len(xs) <= 2:
                    mask = np.ones(len(xs), dtype=bool)
                else:
                    mask = _dp_mask(xs, ys, eps)
                rows.append(
                    {
                        id_col: r[id_col],
                        "xs": xs[mask].tolist(),
                        "ys": ys[mask].tolist(),
                        "n_in": int(len(xs)),
                        "n_out": int(mask.sum()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "xs", "ys", "n_in", "n_out"]
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("xs", T.ArrayType(T.DoubleType())),
            T.StructField("ys", T.ArrayType(T.DoubleType())),
            T.StructField("n_in", T.IntegerType()),
            T.StructField("n_out", T.IntegerType()),
        ]
    )
    return lines.select(
        F.col(id_col).cast("string").alias(id_col), "xs", "ys"
    ).mapInPandas(simp, schema)


# --- DuckDB oracle mirrors (driver-contract hash checks) ----------------------

def _octagon_corner(order_by: str) -> str:
    return (
        "SELECT layer_id, x, y FROM pts QUALIFY row_number() OVER "
        f"(PARTITION BY layer_id ORDER BY {order_by}) = 1"
    )


def sql_convex_hull(sql_points: str) -> str:
    """Non-recursive exact hull mirror on the µdeg lattice (module doc).

    Input CTE contract: `sql_points` yields (a_string, lon, lat); the
    group key is a_string, coordinates quantize to BIGINT µdeg with
    the same FLOOR(v*1e6+0.5) the Spark query applies. Output:
    (layer_id, n_hull, area2_u) where area2_u = |Σ cross| (twice the
    hull area in µdeg², exact int64 — order-free, so it hash-matches
    the Spark fold regardless of vertex start).

    Correctness of the octagon prefilter: a hull vertex is an extreme
    point, never strictly inside any convex polygon of input points,
    so every hull vertex survives — and every false edge (a,b) has a
    surviving hull-vertex witness strictly right of a→b or collinear
    beyond the segment, so the NOT EXISTS over survivors rejects it.
    Duplicate octagon corners make that edge zero-length; the
    is-degenerate disjunct skips it (otherwise cross>0 can never hold
    and the prefilter silently keeps everything — measured: group P
    kept 5088/5088 before the guard, 82 after).
    """
    corners = {
        "w": "x, y", "s": "y, x", "e": "x DESC, y DESC", "n": "y DESC, x DESC",
        "sw": "x + y, x", "ne": "x + y DESC, x DESC",
        "se": "x - y DESC, x DESC", "nw": "x - y, x",
    }
    corner_ctes = ",\n".join(
        f"{k} AS ({_octagon_corner(v)})" for k, v in corners.items()
    )
    # CCW direction order of the 8 extremes
    ring = ["w", "sw", "s", "se", "e", "ne", "n", "nw"]
    edge_skip = " AND\n    ".join(
        f"((o.cx[{j}] = o.cx[{i}] AND o.cy[{j}] = o.cy[{i}]) OR "
        f"(o.cx[{j}]-o.cx[{i}])*(p.y-o.cy[{i}]) - "
        f"(o.cy[{j}]-o.cy[{i}])*(p.x-o.cx[{i}]) > 0)"
        for i, j in ((k, k % 8 + 1) for k in range(1, 9))
    )
    cx = ", ".join(f"{c}.x" for c in ring)
    cy = ", ".join(f"{c}.y" for c in ring)
    joins = " ".join(f"JOIN {c} USING (layer_id)" for c in ring[1:])
    return f"""
WITH pts0 AS ({sql_points}),
pts AS (
  SELECT DISTINCT a_string AS layer_id,
         CAST(FLOOR(lon * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(lat * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM pts0
),
{corner_ctes},
oc AS (
  SELECT w.layer_id, [{cx}] AS cx, [{cy}] AS cy
  FROM w {joins}
),
cand AS (
  SELECT p.layer_id, p.x, p.y
  FROM pts p JOIN oc o USING (layer_id)
  WHERE NOT (
    {edge_skip}
  )
),
hull_edges AS (
  SELECT a.layer_id, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM cand a JOIN cand b USING (layer_id)
  WHERE (a.x <> b.x OR a.y <> b.y)
    AND NOT EXISTS (
      SELECT 1 FROM cand r
      WHERE r.layer_id = a.layer_id
        AND NOT (
          (b.x - a.x) * (r.y - a.y) - (b.y - a.y) * (r.x - a.x) > 0
          OR ( (b.x - a.x) * (r.y - a.y) - (b.y - a.y) * (r.x - a.x) = 0
               AND (r.x - a.x) * (b.x - a.x) + (r.y - a.y) * (b.y - a.y) >= 0
               AND (r.x - a.x) * (b.x - a.x) + (r.y - a.y) * (b.y - a.y)
                   <= (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) )
        )
    )
)
SELECT layer_id, CAST(COUNT(*) AS BIGINT) AS n_hull,
       CAST(ABS(SUM(ax * by - bx * ay)) AS BIGINT) AS area2_u
FROM hull_edges GROUP BY layer_id
"""


SIMPLIFY_EPS = 1e-9


def sql_simplify_ring7(sql_polygons: str) -> str:
    """Recursive-CTE Douglas–Peucker mirror over the densified
    7-vertex rectangle ring [(minx,miny), (mid,miny), (maxx,miny),
    (maxx,mid), (maxx,maxy), (minx,maxy), (minx,miny)] — the two edge
    midpoints are exactly collinear, so DP at ε=1e-9 drops them
    (n_in=7 → n_out=5 — the oracle verifies actual vertex DROPS, not
    just pass-through). Interval argmax ties break to the lowest idx
    (np.argmax first-max); closed-ring endpoints hit the same
    zero-length-segment distance branch as `_dp_mask`.

    Output: (line_id, n_in, n_out).
    """
    return f"""
WITH RECURSIVE polys AS ({sql_polygons}),
v AS (
  SELECT poly_id AS line_id, CAST(i AS INTEGER) AS idx,
    CASE CAST(i AS INTEGER) WHEN 0 THEN minx WHEN 1 THEN (minx + maxx) / 2.0
      WHEN 2 THEN maxx WHEN 3 THEN maxx WHEN 4 THEN maxx
      WHEN 5 THEN minx ELSE minx END AS x,
    CASE CAST(i AS INTEGER) WHEN 0 THEN miny WHEN 1 THEN miny WHEN 2 THEN miny
      WHEN 3 THEN (miny + maxy) / 2.0 WHEN 4 THEN maxy
      WHEN 5 THEN maxy ELSE miny END AS y
  FROM polys CROSS JOIN (SELECT UNNEST(range(7)) AS i)
),
iv(line_id, i, j) AS (
  SELECT poly_id, 0, 6 FROM polys
  UNION ALL
  SELECT s.line_id, u.lo, u.hi
  FROM (
    SELECT line_id, i, j, k, d,
           row_number() OVER (PARTITION BY line_id, i, j
                              ORDER BY d DESC, k ASC) AS rn
    FROM (
      SELECT t.line_id, t.i, t.j, p.idx AS k,
        CASE WHEN b.x - a.x = 0 AND b.y - a.y = 0
          THEN sqrt((p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y))
          ELSE abs((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
               / sqrt((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))
        END AS d
      FROM iv t
      JOIN v a ON a.line_id = t.line_id AND a.idx = t.i
      JOIN v b ON b.line_id = t.line_id AND b.idx = t.j
      JOIN v p ON p.line_id = t.line_id AND p.idx > t.i AND p.idx < t.j
    ) raw
  ) s
  CROSS JOIN UNNEST([{{'lo': s.i, 'hi': s.k}}, {{'lo': s.k, 'hi': s.j}}]) AS t(u)
  WHERE s.rn = 1 AND s.d > {SIMPLIFY_EPS}
),
kept AS (
  SELECT line_id, i AS idx FROM iv
  UNION
  SELECT line_id, j AS idx FROM iv
)
SELECT line_id, CAST(7 AS BIGINT) AS n_in,
       CAST(COUNT(DISTINCT idx) AS BIGINT) AS n_out
FROM kept GROUP BY line_id
"""


def ring_perimeter(polygons: DataFrame) -> DataFrame:
    """Per-polygon perimeter (planar degrees): the ordered fold of
    sqrt(dx^2 + dy^2) over consecutive vertex pairs, skipping edges
    that cross a ring boundary (ring_offsets), all inside one
    codegen-native higher-order expression — map-only, no shuffle, no
    Python.

    Bit-exactness: mul/add/sqrt are correctly-rounded IEEE ops, and
    F.aggregate folds LEFT-TO-RIGHT in vertex order — the DuckDB
    mirror (sql_rect_perimeter) writes the same left-associated sum,
    so the final double hash-matches (no trig, whose libm rounding is
    NOT guaranteed identical across engines — the same reason the knn
    oracle ranks on planar squared distance).

    Output: (poly_id, n_vertices, perimeter_deg).
    """
    xs, ys, ro = F.col("geom.xs"), F.col("geom.ys"), F.col("geom.ring_offsets")
    n = F.size(xs)
    j1 = lambda j: j + 1          # 0-based vertex -> 1-based element_at
    j2 = lambda j: j + 2
    dx = lambda j: F.element_at(xs, j2(j)) - F.element_at(xs, j1(j))
    dy = lambda j: F.element_at(ys, j2(j)) - F.element_at(ys, j1(j))
    edge = lambda j: F.when(
        F.array_contains(ro, j + 1), F.lit(0.0)  # ring boundary: no edge
    ).otherwise(F.sqrt(dx(j) * dx(j) + dy(j) * dy(j)))
    perim = F.aggregate(
        F.sequence(F.lit(0), n - 2),
        F.lit(0.0),
        lambda acc, j: acc + edge(j),
    )
    return polygons.select(
        "poly_id",
        n.cast("long").alias("n_vertices"),
        perim.alias("perimeter_deg"),
    )


def sql_rect_perimeter(sql_polygons: str) -> str:
    """DuckDB mirror for the rectangle corpus: vertex ring
    [(minx,miny),(maxx,miny),(maxx,maxy),(minx,maxy),(minx,miny)]
    expanded to the same four sqrt terms in the same left-associated
    order as ring_perimeter's fold (0.0 + e0 + e1 + e2 + e3; each
    edge keeps its literal dx/dy algebra so every intermediate double
    is identical)."""
    edges = [
        ("maxx - minx", "miny - miny"),
        ("maxx - maxx", "maxy - miny"),
        ("minx - maxx", "maxy - maxy"),
        ("minx - minx", "miny - maxy"),
    ]
    chain = "0.0"
    for dx, dy in edges:
        chain = f"({chain} + sqrt(({dx}) * ({dx}) + ({dy}) * ({dy})))"
    return f"""
WITH polys AS ({sql_polygons})
SELECT poly_id, CAST(5 AS BIGINT) AS n_vertices,
       {chain} AS perimeter_deg
FROM polys
"""


# ---------------------------------------------------------------------------
# Geodesic (sphere-corrected) polygon area
# ---------------------------------------------------------------------------

# Shared literals: BOTH the Spark expression and the DuckDB mirror are
# built from these exact double reprs, so every intermediate is the
# same IEEE value on both engines.
_DEG2RAD = 0.017453292519943295          # repr(math.pi / 180)
_HALF_R2_KM2 = 20294876.56483872         # repr(6371.0088**2 / 2) — IUGG mean radius
# Taylor cosine through x^8 (max |err| ~2.5e-5 at the poles, ~1e-7 at
# mid-latitudes): polynomials use only correctly-rounded * and +, so —
# unlike libm cos/sin, whose last-ulp rounding differs across engines —
# the value is bit-identical in Spark and DuckDB.
_COS_C2 = -0.5
_COS_C4 = 0.041666666666666664
_COS_C6 = -0.001388888888888889
_COS_C8 = 2.48015873015873e-05


def geodesic_area(polygons: DataFrame) -> DataFrame:
    """Per-polygon area in km² on the sphere: each vertex is projected
    with the equal-area sinusoidal projection x = λ·cos(φ), y = φ
    (radians), then the planar shoelace runs over the projected ring —
    the standard small-polygon spherical-area estimate (exact as the
    polygon diameter → 0; the corpus layers span a few degrees).

    cos is evaluated as the explicit Taylor polynomial above instead
    of libm cos: the polynomial is a chain of correctly-rounded IEEE
    mul/add, so the Spark plan and the DuckDB oracle produce the SAME
    double — the ring_perimeter discipline extended to a projected
    metric (libm trig is the one thing those oracles must avoid).

    The fold is F.aggregate LEFT-TO-RIGHT over vertex order — one
    codegen-native higher-order expression, map-only, no shuffle, no
    Python. Edges crossing a ring boundary (ring_offsets) contribute
    0; since every stored ring is closed (last vertex == first), the
    remaining terms are exactly the sum of per-ring shoelaces, so
    opposite-orientation holes subtract naturally.

    Output: (poly_id, n_vertices, area_km2) — area_km2 =
    |Σ x_j·y_{j+1} − x_{j+1}·y_j| · R²/2.
    """
    xs, ys, ro = F.col("geom.xs"), F.col("geom.ys"), F.col("geom.ring_offsets")
    n = F.size(xs)
    lam = lambda j: F.element_at(xs, j + 1) * F.lit(_DEG2RAD)
    phi = lambda j: F.element_at(ys, j + 1) * F.lit(_DEG2RAD)

    def cosp(t):
        tt = t * t
        return F.lit(1.0) + tt * (
            F.lit(_COS_C2)
            + tt * (F.lit(_COS_C4) + tt * (F.lit(_COS_C6) + tt * F.lit(_COS_C8)))
        )

    x = lambda j: lam(j) * cosp(phi(j))
    y = phi
    term = lambda j: F.when(
        F.array_contains(ro, j + 1), F.lit(0.0)  # ring boundary: no edge
    ).otherwise(x(j) * y(j + 1) - x(j + 1) * y(j))
    raw = F.aggregate(
        F.sequence(F.lit(0), n - 2),
        F.lit(0.0),
        lambda acc, j: acc + term(j),
    )
    return polygons.select(
        "poly_id",
        n.cast("long").alias("n_vertices"),
        (F.abs(raw) * F.lit(_HALF_R2_KM2)).alias("area_km2"),
    )


def sql_rect_geodesic_area(sql_polygons: str) -> str:
    """DuckDB mirror for the rectangle corpus: the closed 5-vertex
    ring [(minx,miny),(maxx,miny),(maxx,maxy),(minx,maxy),(minx,miny)]
    expanded to the same four left-associated shoelace terms with the
    same literal constants and the same polynomial-cos algebra, so
    every intermediate double is identical to geodesic_area's fold."""
    D, H = repr(_DEG2RAD), repr(_HALF_R2_KM2)
    c2, c4, c6, c8 = (repr(c) for c in (_COS_C2, _COS_C4, _COS_C6, _COS_C8))
    ring = [
        ("minx", "miny"), ("maxx", "miny"), ("maxx", "maxy"),
        ("minx", "maxy"), ("minx", "miny"),
    ]

    def xy(k):
        lon, lat = ring[k]
        t = f"(({lat}) * {D})"
        tt = f"({t} * {t})"
        poly = f"(1.0 + {tt} * ({c2} + {tt} * ({c4} + {tt} * ({c6} + {tt} * {c8}))))"
        return f"((({lon}) * {D}) * {poly})", t

    chain = "0.0"
    for j in range(4):
        xj, yj = xy(j)
        xj1, yj1 = xy(j + 1)
        chain = f"({chain} + ({xj} * {yj1} - {xj1} * {yj}))"
    return f"""
WITH polys AS ({sql_polygons})
SELECT poly_id, CAST(5 AS BIGINT) AS n_vertices,
       abs({chain}) * {H} AS area_km2
FROM polys
"""
