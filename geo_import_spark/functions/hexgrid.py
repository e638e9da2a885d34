"""H3-style hexagonal cell encoding as closed-form JVM arithmetic.

The north rule indexes geometries with "batched H3 cell encoding
(res 7-12)". The engine's primary index is the quadtree cell family
(functions/cells.py — equi-joinable, prefix-nestable); this module
adds the HEXAGONAL lattice the rule names: a flat-top axial hex grid
with aperture-4 resolution scaling (cell size halves per res, so res
7-12 spans 0.5 deg -> ~0.016 deg). Hexagons are the standard choice
for density/flow analytics because every neighbor is edge-adjacent at
the same distance (no corner-neighbor ambiguity).

Encoding is the textbook axial transform + cube rounding
(Amit Patel's "Hexagonal Grids", public domain reference):

    qf = (sqrt(3)/3 * x - 1/3 * y) / s      rf = (2/3 * y) / s
    cube-round (qf, -qf-rf, rf) -> (q, r)

rendered as ONE SQL expression template valid in Spark AND DuckDB —
whole-stage-codegen JVM math on the Spark side (no UDF, no shuffle),
the literal same text in the oracle, so the assignments hash-compare
exactly. Rounding is floor(v + 0.5) (identical semantics in both
engines; `round()` half-even/half-up behavior differs by engine and
type, floor does not). Spark's floor(double) returns BIGINT while
DuckDB's returns DOUBLE, so every emitted coordinate is wrapped in
CAST(... AS BIGINT); the values agree because |q|,|r| << 2^53.

Scale shape: encode is a pure map (zero shuffles); hex_density is one
map-side-combined aggregation on (hq, hr) — the same plan family as
tiling.grid_density, on the hex lattice instead of the quadtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Cell size: res 0 = 64 deg, halving per res (aperture 4). Exact
# powers of two, so the literal is an exact double in both engines.
BASE_SIZE_DEG = 64.0


def size_for_res(res: int) -> float:
    return BASE_SIZE_DEG / (2 ** res)


def _d(v: float) -> str:
    """Double literal. Spark parses a bare `3.0` as DECIMAL(2,1) and
    runs the whole expression in decimal arithmetic; DuckDB parses it
    as DOUBLE — the CAST pins both engines to IEEE doubles (same
    trick as linejoin.clip_exprs)."""
    return f"CAST({v!r} AS DOUBLE)"


def _round_half_up(v: str) -> str:
    return f"floor(({v}) + {_d(0.5)})"


def hex_qr_exprs(x: str, y: str, s: float) -> tuple[str, str]:
    """(q_sql, r_sql) axial hex coordinates of point (x, y) on the
    flat-top hex lattice with size s — SQL text valid in Spark and
    DuckDB. Cube rounding keeps the nearest hex center: round each
    cube axis, then recompute the axis with the largest rounding
    error from the other two (x + y + z = 0 invariant)."""
    qf = (
        f"((sqrt({_d(3.0)}) / {_d(3.0)} * ({x})"
        f" - {_d(1.0)} / {_d(3.0)} * ({y})) / {_d(s)})"
    )
    rf = f"(({_d(2.0)} / {_d(3.0)} * ({y})) / {_d(s)})"
    yf = f"(-({qf}) - ({rf}))"
    rx = _round_half_up(qf)
    ry = _round_half_up(yf)
    rz = _round_half_up(rf)
    dx = f"abs(({rx}) - ({qf}))"
    dy = f"abs(({ry}) - ({yf}))"
    dz = f"abs(({rz}) - ({rf}))"
    fix_x = f"(({dx}) > ({dy}) AND ({dx}) > ({dz}))"
    fix_y = f"(({dy}) > ({dz}))"
    q = (
        f"CAST(CASE WHEN {fix_x} THEN -(({ry}) + ({rz}))"
        f" ELSE ({rx}) END AS BIGINT)"
    )
    r = (
        f"CAST(CASE WHEN {fix_x} THEN ({rz})"
        f" WHEN {fix_y} THEN ({rz})"
        f" ELSE -(({rx}) + ({ry})) END AS BIGINT)"
    )
    return q, r


def hex_center_exprs(q: str, r: str, s: float) -> tuple[str, str]:
    """(cx_sql, cy_sql): the hex center of axial cell (q, r) — the
    exact inverse of hex_qr_exprs' forward transform."""
    cx = (
        f"({_d(s)} * sqrt({_d(3.0)}) * (CAST({q} AS DOUBLE)"
        f" + CAST({r} AS DOUBLE) / {_d(2.0)}))"
    )
    cy = f"({_d(s)} * {_d(1.5)} * CAST({r} AS DOUBLE))"
    return cx, cy


def hex_cols(points: DataFrame, res: int, lon: str = "lon",
             lat: str = "lat") -> DataFrame:
    """Append (res, hq, hr) to a point frame — pure JVM map."""
    q, r = hex_qr_exprs(lon, lat, size_for_res(res))
    return points.withColumns({
        "res": F.lit(res).cast("int"),
        "hq": F.expr(q),
        "hr": F.expr(r),
    })


def hex_encode(points: DataFrame, res_list: tuple[int, ...] = (7, 9),
               id_col: str = "doc_id") -> DataFrame:
    """(id, res, hq, hr) at each requested resolution — a multi-res
    union of zero-shuffle maps (one scan per res over the cached
    parse; at scale, one scan with an explode would trade scan count
    for a wider row — both shuffle-free)."""
    out = None
    for res in res_list:
        part = hex_cols(points, res).select(id_col, "res", "hq", "hr")
        out = part if out is None else out.unionAll(part)
    return out


def hex_density(points: DataFrame, res: int = 8) -> DataFrame:
    """(hq, hr, n, cx, cy): point count per hex cell plus the decoded
    cell center — ONE map-side-combined shuffle on (hq, hr)."""
    s = size_for_res(res)
    cx, cy = hex_center_exprs("hq", "hr", s)
    return (
        hex_cols(points, res)
        .groupBy("hq", "hr")
        .agg(F.count("*").alias("n"))
        .select("hq", "hr", "n", F.expr(cx).alias("cx"), F.expr(cy).alias("cy"))
    )


def kring_offsets(k: int = 1) -> list[tuple[int, int]]:
    """Axial offsets of the hex k-ring disk (self included): all
    (dq, dr) with max(|dq|, |dr|, |dq+dr|) <= k — 3k(k+1)+1 cells.
    One literal list renders into BOTH the Spark plan and the oracle
    SQL, so the neighborhoods cannot drift."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if max(abs(dq), abs(dr), abs(dq + dr)) <= k
    ]


def hex_smooth(points: DataFrame, res: int = 8, k: int = 1) -> DataFrame:
    """(hq, hr, n_self, n_smooth): per-hex own count plus the k-ring
    neighborhood sum — the hotspot-smoothing pass. Cells that are
    empty but border occupied cells appear with n_self = 0.

    Plan: ONE shuffle for the density aggregate, then a bounded
    map-side explode of the 3k(k+1)+1 ring offsets and a second
    map-side-combined aggregate on the shifted key — the standard
    scalable stencil: no self-join of the cell table, no point-side
    re-shuffle, contribution rows ~= cells x ring size.
    """
    dens = (
        hex_cols(points, res).groupBy("hq", "hr").agg(F.count("*").alias("n"))
    )
    offs = F.array(*[
        F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
        for dq, dr in kring_offsets(k)
    ])
    contrib = dens.select(
        "hq", "hr", "n", F.explode(offs).alias("o")
    ).select(
        (F.col("hq") + F.col("o.dq")).alias("hq"),
        (F.col("hr") + F.col("o.dr")).alias("hr"),
        "n",
        ((F.col("o.dq") == 0) & (F.col("o.dr") == 0)).alias("self"),
    )
    return contrib.groupBy("hq", "hr").agg(
        F.coalesce(
            F.sum(F.when(F.col("self"), F.col("n"))), F.lit(0).cast("long")
        ).alias("n_self"),
        F.sum("n").alias("n_smooth"),
    )


def sql_hex_smooth(sql_points: str, res: int = 8, k: int = 1) -> str:
    q, r = hex_qr_exprs("lon", "lat", size_for_res(res))
    values = ", ".join(f"({dq}, {dr})" for dq, dr in kring_offsets(k))
    return f"""
WITH pts AS ({sql_points}),
cells AS (
  SELECT hq, hr, COUNT(*) AS n
  FROM (SELECT {q} AS hq, {r} AS hr FROM pts) GROUP BY hq, hr
),
off(dq, dr) AS (VALUES {values}),
contrib AS (
  SELECT hq + dq AS hq, hr + dr AS hr, n,
         (dq = 0 AND dr = 0) AS self
  FROM cells CROSS JOIN off
)
SELECT hq, hr,
       CAST(COALESCE(SUM(CASE WHEN self THEN n END), 0) AS BIGINT) AS n_self,
       CAST(SUM(n) AS BIGINT) AS n_smooth
FROM contrib GROUP BY hq, hr
"""


def sql_hex_encode(sql_points: str, res_list: tuple[int, ...] = (7, 9),
                   id_col: str = "doc_id") -> str:
    parts = []
    for res in res_list:
        q, r = hex_qr_exprs("lon", "lat", size_for_res(res))
        parts.append(
            f"SELECT {id_col}, CAST({res} AS INTEGER) AS res,"
            f" {q} AS hq, {r} AS hr FROM pts"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"WITH pts AS ({sql_points})\n{union}"


def sql_hex_density(sql_points: str, res: int = 8) -> str:
    s = size_for_res(res)
    q, r = hex_qr_exprs("lon", "lat", s)
    cx, cy = hex_center_exprs("hq", "hr", s)
    return f"""
WITH pts AS ({sql_points}),
cells AS (SELECT {q} AS hq, {r} AS hr FROM pts)
SELECT hq, hr, COUNT(*) AS n, {cx} AS cx, {cy} AS cy
FROM cells GROUP BY hq, hr
"""
