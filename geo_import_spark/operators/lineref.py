"""Linear referencing + movement direction over ordered tracks.

PostGIS-style `ST_LineInterpolatePoint` / `ST_Azimuth` analogues over
the engine's walk-track corpus (trajectory.walk_points), re-expressed
relationally so they run as window passes instead of per-geometry
loops. The reference pipeline stops at decode/normalize (es6-lib has
no linear referencing); these extend the trajectory family the same
way od_matrix / staypoints do.

Exactness discipline (the house µdeg-int64 rules):

- Track length uses the L-infinity (Chebyshev) hop metric
  max(|dx|, |dy|) — an exact BIGINT that is additive along the path,
  so the cumulative-length window, the fraction target (k/4)·total and
  the containing-segment predicate all compare as exact int64
  (`den·cum_prev <= k·total < den·cum`) with zero cross-engine float
  accumulation. A Euclidean deployment swaps seglen for
  sqrt(dx²+dy²); the plan shape is unchanged (the sum then rides the
  same running window — floats, so the oracle contract would weaken
  to tolerance instead of hash equality, which is why the registered
  query keeps the exact metric).
- The within-segment lerp is ONE double expression over exact
  integers < 2^53 — floor(dx·num/den + 0.5) — identical IEEE
  arithmetic in Spark and DuckDB, so the emitted coordinates are
  exact BIGINTs.
- Bearing never touches atan2 (libm results differ across engines in
  the last ulp, which could flip a sector at a boundary): the octant
  is a pure sign/magnitude CASE cascade over exact integers, shared
  verbatim between the Spark plan (F.expr) and the DuckDB mirror —
  the _z_expr pattern from spatialstats.

Scale notes (100 TB story): line_interpolate is two window passes and
a bounded ×|fracs| explode, all on the ONE hash exchange by track key
— composing with walk_points/staypoints adds no new shuffle.
od_bearing adds a lead window on the same key plus one
map-side-combining groupBy onto an 8-row frame. No joins, no
driver-side state, no data-sized collect.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fraction targets k/FRAC_DEN along the track (k in FRAC_KS)
FRAC_DEN = 4
FRAC_KS = (1, 2, 3)

# The octant CASE over integer hop deltas (dx, dy): 8 sectors of 45
# degrees, 0 = east-northeast [0,45), counting counter-clockwise.
# Boundaries are assigned deterministically by the strict/non-strict
# comparison pattern below; (0,0) hops yield NULL. Shared verbatim by
# both engines, so the sector verdict is bit-identical by construction.
OCTANT_CASE = """CASE
  WHEN dx = 0 AND dy = 0 THEN NULL
  WHEN dy >= 0 AND dx > 0 AND dx > dy THEN 0
  WHEN dx > 0 AND dy > 0 AND dy >= dx THEN 1
  WHEN dy > 0 AND dx <= 0 AND -dx < dy THEN 2
  WHEN dy > 0 AND dx < 0 AND -dx >= dy THEN 3
  WHEN dy <= 0 AND dx < 0 AND -dx > -dy THEN 4
  WHEN dx < 0 AND dy < 0 AND -dy >= -dx THEN 5
  WHEN dy < 0 AND dx >= 0 AND dx < -dy THEN 6
  ELSE 7 END"""


def line_interpolate(
    walk: DataFrame,
    ks: tuple[int, ...] = FRAC_KS,
    den: int = FRAC_DEN,
) -> DataFrame:
    """The point at fraction k/den of each track's path length, for
    every k in `ks` — ST_LineInterpolatePoint over (cust, i, x, y)
    tracks.

    Plan: one window pass derives per-hop segments (lag), a second
    running-sum window on the SAME partitioning accumulates exact
    Chebyshev length, a bounded ×|ks| explode fans out the fraction
    targets, and the containing segment is selected by an exact
    half-open BIGINT interval test `den·cum_prev <= k·total < den·cum`
    — at most one segment matches per (track, k) because the
    intervals partition [0, den·total), zero-length segments having
    empty intervals. Tracks with < 2 pings (or all pings coincident)
    produce no rows, matching the mirror.

    Output: (cust, frac_k, px, py) with px/py exact BIGINT µdeg.
    """
    w = Window.partitionBy("cust").orderBy("i")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("cust")
    seg = walk.select(
        "cust", "i", "x", "y",
        F.lag("x").over(w).alias("x0"),
        F.lag("y").over(w).alias("y0"),
    ).filter(F.col("x0").isNotNull())
    seglen = F.greatest(
        F.abs(F.col("x") - F.col("x0")), F.abs(F.col("y") - F.col("y0"))
    )
    cum = seg.select(
        "cust", "x0", "y0", "x", "y",
        seglen.alias("seglen"),
        F.sum(seglen).over(run).alias("cum"),
        F.sum(seglen).over(whole).alias("total"),
    )
    fan = cum.select(
        "*", F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("frac_k")
    )
    d = F.lit(int(den))
    target = F.col("frac_k") * F.col("total")
    hit = fan.filter(
        (d * (F.col("cum") - F.col("seglen")) <= target) & (target < d * F.col("cum"))
    )
    num = target - d * (F.col("cum") - F.col("seglen"))
    lerp = lambda a0, a1: (  # noqa: E731
        a0
        + F.floor(
            ((a1 - a0) * num).cast("double")
            / (d * F.col("seglen")).cast("double")
            + F.lit(0.5)
        ).cast("long")
    )
    return hit.select(
        "cust",
        F.col("frac_k").cast("long").alias("frac_k"),
        lerp(F.col("x0"), F.col("x")).alias("px"),
        lerp(F.col("y0"), F.col("y")).alias("py"),
    )


def sql_line_interpolate(
    sql_walk: str,
    ks: tuple[int, ...] = FRAC_KS,
    den: int = FRAC_DEN,
) -> str:
    k_list = ", ".join(str(int(k)) for k in ks)
    d = int(den)
    return f"""
WITH walk AS ({sql_walk}),
seg0 AS (
  SELECT cust, i, x, y,
         lag(x) OVER (PARTITION BY cust ORDER BY i) AS x0,
         lag(y) OVER (PARTITION BY cust ORDER BY i) AS y0
  FROM walk
),
seg AS (
  SELECT cust, x0, y0, x, y,
         GREATEST(ABS(x - x0), ABS(y - y0)) AS seglen,
         SUM(GREATEST(ABS(x - x0), ABS(y - y0)))
           OVER (PARTITION BY cust ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(GREATEST(ABS(x - x0), ABS(y - y0)))
           OVER (PARTITION BY cust) AS total
  FROM seg0 WHERE x0 IS NOT NULL
),
fan AS (
  SELECT s.*, ks.frac_k
  FROM seg s CROSS JOIN (SELECT unnest([{k_list}]) AS frac_k) ks
)
SELECT cust,
       CAST(frac_k AS BIGINT) AS frac_k,
       x0 + CAST(FLOOR(CAST((x - x0) * (frac_k * total - {d} * (cum - seglen))
                            AS DOUBLE)
                       / CAST({d} * seglen AS DOUBLE) + 0.5) AS BIGINT) AS px,
       y0 + CAST(FLOOR(CAST((y - y0) * (frac_k * total - {d} * (cum - seglen))
                            AS DOUBLE)
                       / CAST({d} * seglen AS DOUBLE) + 0.5) AS BIGINT) AS py
FROM fan
WHERE {d} * (cum - seglen) <= frac_k * total
  AND frac_k * total < {d} * cum
"""


def od_bearing(stays: DataFrame) -> DataFrame:
    """Compass histogram of inter-staypoint trips: each consecutive
    staypoint pair on a track becomes a hop (lead window on the SAME
    cust partitioning staypoints used — no new exchange when
    composed), classified into one of 8 exact 45-degree octants by
    OCTANT_CASE, then ONE map-side-combining groupBy onto <= 8 rows.

    Output: (sector, n_trips, l1_total) — sector 0..7 CCW from
    east-northeast; l1_total = Σ(|dx|+|dy|) exact BIGINT µdeg.
    """
    w = Window.partitionBy("cust").orderBy("start_i")
    hops = stays.select(
        (F.lead("ax").over(w) - F.col("ax")).alias("dx"),
        (F.lead("ay").over(w) - F.col("ay")).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    return (
        hops.select(
            F.expr(OCTANT_CASE).cast("long").alias("sector"),
            (F.abs(F.col("dx")) + F.abs(F.col("dy"))).alias("l1"),
        )
        .filter(F.col("sector").isNotNull())
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum("l1").alias("l1_total"),
        )
    )


def sql_od_bearing(sql_stays: str) -> str:
    return f"""
WITH stays AS ({sql_stays}),
hops AS (
  SELECT lead(ax) OVER w - ax AS dx,
         lead(ay) OVER w - ay AS dy
  FROM stays WINDOW w AS (PARTITION BY cust ORDER BY start_i)
),
sect AS (
  SELECT CAST({OCTANT_CASE} AS BIGINT) AS sector,
         ABS(dx) + ABS(dy) AS l1
  FROM hops WHERE dx IS NOT NULL
)
SELECT sector, COUNT(*) AS n_trips, CAST(SUM(l1) AS BIGINT) AS l1_total
FROM sect WHERE sector IS NOT NULL
GROUP BY sector
"""


# ---------------------------------------------------------------------------
# Segment densification (ST_Segmentize analogue, exact lattice)
# ---------------------------------------------------------------------------

DENSIFY_SUB = 4  # substeps per segment


def line_densify(segments: DataFrame,
                 nsub: int = DENSIFY_SUB) -> DataFrame:
    """PostGIS `ST_Segmentize` analogue: insert nsub-1 evenly spaced
    vertices along every segment (plus both endpoints), emitted on
    the 1/nsub-micro-degree lattice so every coordinate is an exact
    BIGINT: pxn = nsub·x1 + i·(x2−x1), i = 0..nsub — no floats, no
    rounding rule to agree on, hash parity structural. Callers
    wanting µdeg floats divide by nsub once at the edge.

    Plan: a pure map — one bounded ×(nsub+1) posexplode of a
    constant sequence; zero shuffles, composes with any upstream
    segment scan unchanged at any scale.

    Output: (line_id, i, pxn, pyn).
    """
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    s = segments.select(
        "line_id", "x1", "y1", dx.alias("dx"), dy.alias("dy"),
        F.posexplode(F.sequence(F.lit(0), F.lit(int(nsub)))).alias("i", "_v"),
    )
    n = F.lit(int(nsub))
    return s.select(
        "line_id", "i",
        (n * F.col("x1") + F.col("i") * F.col("dx")).alias("pxn"),
        (n * F.col("y1") + F.col("i") * F.col("dy")).alias("pyn"),
    )


def sql_line_densify(sql_segments: str,
                     nsub: int = DENSIFY_SUB) -> str:
    """Mirror: LATERAL generate_series over the same segment CTE,
    identical integer lattice arithmetic."""
    return f"""
WITH seg AS ({sql_segments})
SELECT line_id, CAST(i AS INTEGER) AS i,
       {int(nsub)} * x1 + i * (x2 - x1) AS pxn,
       {int(nsub)} * y1 + i * (y2 - y1) AS pyn
FROM seg, LATERAL generate_series(0, {int(nsub)}) AS t(i)
"""
