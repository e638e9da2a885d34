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

These have no SQL mirror (recursive/iterative — the class the driver
contract exempts from oracle_sql); correctness is pinned by property
tests (tests/test_geomops.py): every input point lies inside the
hull, hull vertices are input points, DP keeps endpoints and is
idempotent, epsilon=0 only drops exactly-collinear vertices.

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
        idx = _hull_indices(xs, ys)
        out.append({"group_key": g, "xs": xs[idx].tolist(), "ys": ys[idx].tolist()})
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
