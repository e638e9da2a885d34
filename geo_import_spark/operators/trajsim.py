"""Trajectory-similarity operators: discrete Fréchet distance and
dynamic-time-warping (DTW) cost between GPS-track pairs.

Both are order-sensitive curve distances Spark's expression language
cannot express (each DP cell depends on three earlier cells), so the
per-pair DP runs inside ONE Arrow-batched mapInPandas over an
already-assembled pair frame — the composition contract the brief's
operator hierarchy prescribes for iterative algorithms:

  tracks   = one groupBy(cust) with sort_array (a single shuffle on
             the track key; arrays bounded by MAX_TRACK_N)
  pairs    = one equi-join producing (track_a, track_b) rows — the
             registered query pairs consecutive cust ids as the
             deterministic demo; at production scale the pair frame
             comes from a BLOCKING stage (OD-cell buckets,
             corridor_join candidates, LSH), never all-pairs
  distances = mapInPandas over pair rows — pure map, zero shuffle,
             constant memory per row (n*m <= MAX_TRACK_N^2 cells)

Exactness discipline (hash parity with the DuckDB mirror): the ground
distance is exact Chebyshev max(|dx|, |dy|) on int64 µdeg, and both
DPs combine cells with only int64 max / min / + — no floats anywhere,
so the results are bit-identical across engines by construction.

  Fréchet:  F(i,j) = max(d(i,j), min(F(i-1,j), F(i,j-1), F(i-1,j-1)))
  DTW:      D(i,j) = d(i,j) + min(D(i-1,j), D(i,j-1), D(i-1,j-1))

(Eiter & Mannila 1994 for the discrete Fréchet recurrence; classic
Bellman DP for DTW. Overflow: d < 4.6e8 µdeg, DTW path <= n+m cells,
so sums stay < ~5e10 << 2^63.)

The DuckDB mirror cannot express the DP directly either — SQL has no
mutable table — so it runs the SAME recurrence as a recursive CTE
over anti-diagonal levels: the per-pair state row carries the f-values
of the last TWO levels as i-indexed lists (level t cell (i, t-i) at
list position i), and each iteration derives level t+1 with pure list
arithmetic. All three predecessors of a level-(t+1) cell live on
levels t and t-1, so there is no within-iteration dependency and the
recursion needs exactly one self-reference (the standard recursive-CTE
restriction). n+m iterations total.

Reference parity: geo-import has no trajectory analytics (es6-lib
decodes rows only); this extends the movement family (trajectory.py,
lineref.py) the engine adds on top.

Scale note (100 TB): the DP is O(n*m) per pair inside a vectorized
Arrow batch; MAX_TRACK_N caps the quadratic the same way theil_sen's
pair guard caps its per-group quadratic (a power-law track cannot
take down a task). The pure-Python cell loop is fine at the bounded
track lengths the cap enforces; a production deployment swaps the
inner kernel for a compiled one (numba/C) without touching the plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TRACK_N = 512  # guard: cap on pings per track entering the O(n*m) DP

_BIG = 1 << 62  # LEAST/min sentinel for absent DP predecessors


def _pair_frame(walk: DataFrame, max_n: int = MAX_TRACK_N) -> DataFrame:
    """(ca, cb, axs, ays, bxs, bys): consecutive-cust track pairs with
    i-ordered coordinate arrays. One shuffle for the per-track
    collect; the self-join's build side re-shuffles only track-sized
    rows (bounded by max_n)."""
    # Lineage-pinned (the dbscan/tile_pyramid pattern): the self-join
    # re-expands this subtree for each side; without the pin the
    # executed plan scans the point source — and runs the per-track
    # aggregation — TWICE (verified: 2 parquet scans before, 1 after).
    tracks = (
        walk.groupBy("cust")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "x", "y"))
            ).alias("pts")
        )
        .filter(F.size("pts") <= max_n)
        .select(
            "cust",
            F.col("pts.x").alias("xs"),
            F.col("pts.y").alias("ys"),
        )
        .localCheckpoint(eager=False)
    )
    a = tracks.alias("a")
    b = tracks.alias("b")
    return a.join(b, F.col("b.cust") == F.col("a.cust") + 1).select(
        F.col("a.cust").alias("ca"),
        F.col("b.cust").alias("cb"),
        F.col("a.xs").alias("axs"),
        F.col("a.ys").alias("ays"),
        F.col("b.xs").alias("bxs"),
        F.col("b.ys").alias("bys"),
    )


def _dp_distances(axs, ays, bxs, bys) -> tuple[int, int]:
    """(frechet, dtw) for one pair — exact int64 DP, both recurrences
    share the one ground-distance matrix."""
    ax = np.asarray(axs, dtype=np.int64)
    ay = np.asarray(ays, dtype=np.int64)
    bx = np.asarray(bxs, dtype=np.int64)
    by = np.asarray(bys, dtype=np.int64)
    n, m = len(ax), len(bx)
    d = np.maximum(
        np.abs(ax[:, None] - bx[None, :]), np.abs(ay[:, None] - by[None, :])
    )
    fr = np.empty((n, m), dtype=np.int64)
    dt = np.empty((n, m), dtype=np.int64)
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                fr[0, 0] = d[0, 0]
                dt[0, 0] = d[0, 0]
                continue
            fbest = _BIG
            dbest = _BIG
            if i > 0:
                fbest = min(fbest, fr[i - 1, j])
                dbest = min(dbest, dt[i - 1, j])
            if j > 0:
                fbest = min(fbest, fr[i, j - 1])
                dbest = min(dbest, dt[i, j - 1])
            if i > 0 and j > 0:
                fbest = min(fbest, fr[i - 1, j - 1])
                dbest = min(dbest, dt[i - 1, j - 1])
            fr[i, j] = max(d[i, j], fbest)
            dt[i, j] = d[i, j] + dbest
    return int(fr[n - 1, m - 1]), int(dt[n - 1, m - 1])


_SCHEMA = T.StructType(
    [
        T.StructField("ca", T.LongType()),
        T.StructField("cb", T.LongType()),
        T.StructField("frechet_u", T.LongType()),
        T.StructField("dtw_u", T.LongType()),
    ]
)


def track_distances(walk: DataFrame, max_n: int = MAX_TRACK_N) -> DataFrame:
    """Discrete Fréchet distance AND DTW cost per consecutive-cust
    track pair: (ca, cb, frechet_u, dtw_u), both exact int64 µdeg
    (DTW in summed µdeg). See module doc for the plan shape."""

    def dp(iterator):
        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                f, t = _dp_distances(r.axs, r.ays, r.bxs, r.bys)
                out.append((r.ca, r.cb, f, t))
            yield pd.DataFrame(out, columns=["ca", "cb", "frechet_u", "dtw_u"])

    return _pair_frame(walk, max_n=max_n).mapInPandas(dp, _SCHEMA)


def hausdorff(walk: DataFrame, max_n: int = MAX_TRACK_N) -> DataFrame:
    """Directed + symmetric Hausdorff distance per consecutive-cust
    track pair: (ca, cb, h_ab_u, h_ba_u, hausdorff_u), exact int64
    µdeg Chebyshev.

    Unlike the Fréchet/DTW DPs, Hausdorff has no sequential dependency
    (max over a of min over b), so it stays ENTIRELY in Catalyst
    expressions — nested zip_with/array_min/array_max, whole-stage
    codegen, zero Python workers. Same pair frame, same guard.

    Scale note: O(n*m) work per pair like the DPs, but as a JVM
    expression over the bounded arrays — the cheapest of the three
    curve distances and the first one to try as a blocking-stage
    prefilter (Hausdorff lower-bounds discrete Fréchet, so pairs can
    be pruned by h before paying the DP).
    """

    def directed(axs, ays, bxs, bys):
        return F.array_max(
            F.zip_with(
                axs,
                ays,
                lambda ax, ay: F.array_min(
                    F.zip_with(
                        bxs,
                        bys,
                        lambda bx, by: F.greatest(
                            F.abs(ax - bx), F.abs(ay - by)
                        ),
                    )
                ),
            )
        )

    pf = _pair_frame(walk, max_n=max_n)
    h_ab = directed(F.col("axs"), F.col("ays"), F.col("bxs"), F.col("bys"))
    h_ba = directed(F.col("bxs"), F.col("bys"), F.col("axs"), F.col("ays"))
    return pf.select(
        "ca",
        "cb",
        h_ab.alias("h_ab_u"),
        h_ba.alias("h_ba_u"),
        F.greatest(h_ab, h_ba).alias("hausdorff_u"),
    )


def sql_hausdorff(sql_walk: str, max_n: int = MAX_TRACK_N) -> str:
    """Mirror: same max-of-min over list_transform — no recursion
    needed (contrast sql_track_distances)."""

    def directed_idx(a: str, b: str) -> str:
        return (
            f"list_max(list_transform(range(1, len({a}xs) + 1), ii -> "
            f"list_min(list_transform(range(1, len({b}xs) + 1), jj -> "
            f"GREATEST(ABS({a}xs[ii] - {b}xs[jj]),"
            f" ABS({a}ys[ii] - {b}ys[jj]))))))"
        )

    h_ab = directed_idx("a", "b")
    h_ba = directed_idx("b", "a")
    return f"""
WITH walk AS ({sql_walk}),
tr AS (
  SELECT cust,
         list(x ORDER BY i) AS xs,
         list(y ORDER BY i) AS ys
  FROM walk GROUP BY cust
  HAVING COUNT(*) <= {int(max_n)}
),
pr AS (
  SELECT a.cust AS ca, b.cust AS cb,
         a.xs AS axs, a.ys AS ays, b.xs AS bxs, b.ys AS bys
  FROM tr a JOIN tr b ON b.cust = a.cust + 1
)
SELECT ca, cb,
       {h_ab} AS h_ab_u,
       {h_ba} AS h_ba_u,
       GREATEST({h_ab}, {h_ba}) AS hausdorff_u
FROM pr
"""


def sql_track_distances(sql_walk: str, max_n: int = MAX_TRACK_N) -> str:
    """Recursive-CTE mirror of BOTH DPs over anti-diagonal levels.

    State row per pair and level t: `cur` / `prv` are n-length lists
    whose position i holds the DP value of cell (i, t-i) / (i, t-1-i)
    (NULL where the cell is out of range), for each DP. Level t+1
    derives from them with list_transform — predecessors (i-1, j) and
    (i, j-1) sit in `cur`, (i-1, j-1) in `prv`, so one self-reference
    suffices. The answer is cur[n] once t = n + m."""
    big = _BIG
    d_ij = (
        "GREATEST(ABS(axs[ii] - bxs[t + 1 - ii]),"
        " ABS(ays[ii] - bys[t + 1 - ii]))"
    )
    return f"""
WITH RECURSIVE walk AS ({sql_walk}),
tr AS (
  SELECT cust,
         list(x ORDER BY i) AS xs,
         list(y ORDER BY i) AS ys,
         COUNT(*) AS n
  FROM walk GROUP BY cust
  HAVING COUNT(*) <= {int(max_n)}
),
pr AS (
  SELECT a.cust AS ca, b.cust AS cb,
         a.xs AS axs, a.ys AS ays, b.xs AS bxs, b.ys AS bys,
         a.n AS n, b.n AS m
  FROM tr a JOIN tr b ON b.cust = a.cust + 1
),
dp AS (
  SELECT ca, cb, n, m, axs, ays, bxs, bys,
         CAST(2 AS BIGINT) AS t,
         list_transform(range(1, n + 1), ii -> CASE WHEN ii = 1
           THEN GREATEST(ABS(axs[1] - bxs[1]), ABS(ays[1] - bys[1]))
           ELSE NULL END) AS fcur,
         list_transform(range(1, n + 1), ii -> CASE WHEN ii = 1
           THEN GREATEST(ABS(axs[1] - bxs[1]), ABS(ays[1] - bys[1]))
           ELSE NULL END) AS dcur,
         list_transform(range(1, n + 1), ii -> CAST(NULL AS BIGINT)) AS fprv,
         list_transform(range(1, n + 1), ii -> CAST(NULL AS BIGINT)) AS dprv
  FROM pr
  UNION ALL
  SELECT ca, cb, n, m, axs, ays, bxs, bys, t + 1,
         list_transform(range(1, n + 1), ii ->
           CASE WHEN t + 1 - ii BETWEEN 1 AND m THEN
             GREATEST({d_ij},
                      LEAST(COALESCE(fcur[ii - 1], {big}),
                            COALESCE(fcur[ii], {big}),
                            COALESCE(fprv[ii - 1], {big})))
           ELSE NULL END),
         list_transform(range(1, n + 1), ii ->
           CASE WHEN t + 1 - ii BETWEEN 1 AND m THEN
             {d_ij} + LEAST(COALESCE(dcur[ii - 1], {big}),
                            COALESCE(dcur[ii], {big}),
                            COALESCE(dprv[ii - 1], {big}))
           ELSE NULL END),
         fcur, dcur
  FROM dp WHERE t < n + m
)
SELECT ca, cb, fcur[n] AS frechet_u, dcur[n] AS dtw_u
FROM dp WHERE t = n + m
"""
