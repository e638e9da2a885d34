"""Trajectory statistics: per-entity path length, net displacement,
and straightness over an ordered point sequence.

The corpus trajectory is each customer's order points (corpus point
formulas in exact integer micro-degrees), ordered by order key — the
classic GPS-track / movement-analytics shape the reference's
point-only model never covers.

Determinism: each hop length is floor(sqrt(dx^2 + dy^2)) in
micro-degrees. dx/dy are exact bigints; the bigint -> double cast and
sqrt are correctly-rounded IEEE ops, so every hop is the identical
double in both engines, and flooring to a bigint BEFORE summing makes
the per-entity sum order-free — no float-accumulation divergence, the
same trick as the BIGINT-cent money math (operators/relational.py).

Scale shape: ONE shuffle on the entity key serves everything — the
lag window orders within the entity, and the groupBy that follows
reuses the same hash partitioning (no second exchange). Skewed
entities (one user with millions of points) are bounded by the window
sort, the standard sessionization cost (streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_import_spark.corpus import spread_scan


def order_points_u(spark, sf_dir: str) -> DataFrame:
    """(cust, seq, x, y): integer micro-degree point per order, the
    SQL_POINTS formulas without the /1e6 (exact bigints)."""
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    k = F.col("o_orderkey")
    return orders.select(
        F.col("o_custkey").cast("long").alias("cust"),
        k.cast("long").alias("seq"),
        ((k * F.lit(2654435761)) % 360000000 - 180000000).alias("x"),
        ((k * F.lit(1779033703) + 12345) % 170000000 - 85000000).alias("y"),
    )


SQL_ORDER_POINTS_U = """
SELECT CAST(o_custkey AS BIGINT) AS cust, CAST(o_orderkey AS BIGINT) AS seq,
       (o_orderkey * 2654435761) % 360000000 - 180000000 AS x,
       (o_orderkey * 1779033703 + 12345) % 170000000 - 85000000 AS y
FROM orders
"""


def _hop(dx, dy):
    return F.floor(
        F.sqrt((dx * dx + dy * dy).cast("double"))
    ).cast("long")


def trajectory_stats(points: DataFrame) -> DataFrame:
    """(cust, n_points, path_len_u, net_disp_u, straightness) over the
    seq-ordered track of each entity; single-point tracks have zero
    lengths and null straightness."""
    w = Window.partitionBy("cust").orderBy("seq")
    hops = points.select(
        "cust",
        "seq",
        "x",
        "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    )
    agg = hops.groupBy("cust").agg(
        F.count("*").alias("n_points"),
        F.coalesce(
            F.sum(_hop(F.col("dx"), F.col("dy"))), F.lit(0).cast("long")
        ).alias("path_len_u"),
        F.min_by(F.struct("x", "y"), "seq").alias("p0"),
        F.max_by(F.struct("x", "y"), "seq").alias("p1"),
    )
    net = _hop(
        F.col("p1.x") - F.col("p0.x"), F.col("p1.y") - F.col("p0.y")
    )
    return agg.select(
        "cust",
        "n_points",
        "path_len_u",
        net.alias("net_disp_u"),
        F.when(
            F.col("path_len_u") > 0,
            net.cast("double") / F.col("path_len_u").cast("double"),
        ).alias("straightness"),
    )


SQL_TRAJECTORY_STATS = f"""
WITH pts AS ({SQL_ORDER_POINTS_U}),
hops AS (
  SELECT cust, seq, x, y,
         x - lag(x) OVER (PARTITION BY cust ORDER BY seq) AS dx,
         y - lag(y) OVER (PARTITION BY cust ORDER BY seq) AS dy
  FROM pts
),
agg AS (
  SELECT cust, count(*) AS n_points,
         COALESCE(CAST(sum(CAST(floor(sqrt(CAST(dx*dx + dy*dy AS DOUBLE)))
                               AS BIGINT)) AS BIGINT), 0) AS path_len_u,
         min_by(struct_pack(x := x, y := y), seq) AS p0,
         max_by(struct_pack(x := x, y := y), seq) AS p1
  FROM hops GROUP BY cust
)
SELECT cust, n_points, path_len_u,
       CAST(floor(sqrt(CAST((p1.x - p0.x)*(p1.x - p0.x)
                            + (p1.y - p0.y)*(p1.y - p0.y) AS DOUBLE)))
            AS BIGINT) AS net_disp_u,
       CASE WHEN path_len_u > 0 THEN
         CAST(floor(sqrt(CAST((p1.x - p0.x)*(p1.x - p0.x)
                              + (p1.y - p0.y)*(p1.y - p0.y) AS DOUBLE)))
              AS BIGINT) / CAST(path_len_u AS DOUBLE)
       END AS straightness
FROM agg
"""

# ---------------------------------------------------------------------------
# Movement analytics: dwell-site walk corpus, staypoint detection, and
# origin-destination (OD) matrix — the geo-import point model extended to
# GPS-track semantics (reference never models ordered tracks; see
# es6-lib/decoders/geojson.js point handling for the per-feature model).
# ---------------------------------------------------------------------------

STAY_EPS_U = 50_000   # staypoint radius: hops <= 0.05 deg stay "still"
STAY_MIN_N = 4        # pings required before a run counts as a stay
OD_CELL = 131_072     # 2^17 micro-deg OD zone cell (power of two ->
                      # the double-division floor is exact, linejoin.py)


def walk_points(spark, sf_dir: str) -> DataFrame:
    """(cust, i, x, y): a deterministic dwell-site walk per customer.

    Each customer's orders (ordered by o_orderkey) become pings: the
    track dwells 5 consecutive pings at a site, then jumps to the next
    site. Site offsets step by (7919 % 50) = 19 and (104729 % 50) = 29
    cells of 100k micro-deg per jump — never zero, so inter-site hops
    are always >= 1.9e6 micro-deg while intra-site jitter is +/-1000
    per axis (hop <= ~2829) — a clean eps margin for staypoint
    detection. All formulas are exact int64 with non-negative mod
    operands, mirrored verbatim in SQL_WALK_POINTS.
    """
    orders = spread_scan(spark, spark.read.parquet(f"{sf_dir}/orders.parquet"))
    c = F.col("o_custkey").cast("long")
    w = Window.partitionBy(c).orderBy(F.col("o_orderkey").cast("long"))
    base = orders.select(
        c.alias("cust"),
        (F.row_number().over(w) - 1).cast("long").alias("i"),
    )
    i, cc = F.col("i"), F.col("cust")
    s = F.expr("i DIV 5")
    return base.select(
        "cust",
        "i",
        (
            (cc * 2654435761 + 31) % 300000000
            + ((s * 7919) % 50) * 100000
            + ((cc * 31 + i * 2246822519 + 5) % 2001 - 1000)
        ).alias("x"),
        (
            (cc * 1779033703 + 77) % 160000000
            + ((s * 104729) % 50) * 100000
            + ((cc * 37 + i * 3266489917 + 11) % 2001 - 1000)
        ).alias("y"),
    )


SQL_WALK_POINTS = """
WITH base AS (
  SELECT CAST(o_custkey AS BIGINT) AS cust,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderkey) - 1 AS BIGINT) AS i
  FROM orders
)
SELECT cust, i,
       (cust * 2654435761 + 31) % 300000000
         + (((i // 5) * 7919) % 50) * 100000
         + ((cust * 31 + i * 2246822519 + 5) % 2001 - 1000) AS x,
       (cust * 1779033703 + 77) % 160000000
         + (((i // 5) * 104729) % 50) * 100000
         + ((cust * 37 + i * 3266489917 + 11) % 2001 - 1000) AS y
FROM base
"""


def staypoints(walk: DataFrame, eps_u: int = STAY_EPS_U,
               min_n: int = STAY_MIN_N) -> DataFrame:
    """Staypoints: maximal runs of consecutive pings whose hop stays
    within eps_u, kept when the run has >= min_n pings.

    Classic GPS staypoint detection (Li et al., GIS'08 shape) done
    relationally: a lag window marks eps-breaking hops, a running sum
    over the SAME window ordering numbers the runs, and one groupBy
    aggregates each run — so the whole operator is ONE shuffle on cust
    (window and groupBy share the hash partitioning). hop^2 compares
    as exact int64 (|dx| < 3.1e8 -> dx^2+dy^2 < 2e17); the centroid is
    the one cross-engine double division sum/n.

    Output: (cust, stay_id, n_pings, start_i, end_i, ax, ay, cx, cy)
    where (ax, ay) is the run's first ping (exact ints, the OD anchor)
    and (cx, cy) the double centroid.
    """
    w = Window.partitionBy("cust").orderBy("i")
    run = Window.partitionBy("cust").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dx = F.col("x") - F.lag("x").over(w)
    dy = F.col("y") - F.lag("y").over(w)
    eps2 = F.lit(int(eps_u) * int(eps_u))
    brk = F.when(
        dx.isNull() | (dx * dx + dy * dy > eps2), F.lit(1)
    ).otherwise(F.lit(0))
    marked = walk.select(
        "cust", "i", "x", "y", F.sum(brk).over(run).alias("stay_id")
    )
    return (
        marked.groupBy("cust", "stay_id")
        .agg(
            F.count("*").alias("n_pings"),
            F.min("i").alias("start_i"),
            F.max("i").alias("end_i"),
            F.min_by("x", "i").alias("ax"),
            F.min_by("y", "i").alias("ay"),
            (F.sum("x") / F.count("*")).alias("cx"),
            (F.sum("y") / F.count("*")).alias("cy"),
        )
        .filter(F.col("n_pings") >= int(min_n))
    )


def sql_staypoints(sql_walk: str, eps_u: int = STAY_EPS_U,
                   min_n: int = STAY_MIN_N) -> str:
    eps2 = int(eps_u) * int(eps_u)
    return f"""
WITH walk AS ({sql_walk}),
hops AS (
  SELECT cust, i, x, y,
         x - lag(x) OVER (PARTITION BY cust ORDER BY i) AS dx,
         y - lag(y) OVER (PARTITION BY cust ORDER BY i) AS dy
  FROM walk
),
marked AS (
  SELECT cust, i, x, y,
         SUM(CASE WHEN dx IS NULL OR dx*dx + dy*dy > {eps2}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY cust ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS stay_id
  FROM hops
)
SELECT cust, stay_id, count(*) AS n_pings,
       min(i) AS start_i, max(i) AS end_i,
       min_by(x, i) AS ax, min_by(y, i) AS ay,
       sum(x) / CAST(count(*) AS DOUBLE) AS cx,
       sum(y) / CAST(count(*) AS DOUBLE) AS cy
FROM marked
GROUP BY cust, stay_id
HAVING count(*) >= {min_n}
"""


def od_matrix(stays: DataFrame, cell: int = OD_CELL) -> DataFrame:
    """OD matrix: trips between consecutive staypoints, bucketed into
    power-of-two zone cells of the stays' anchor pings.

    A lead window pairs each stay with the next one on the same track
    (same cust partitioning as staypoints -> the window adds no new
    exchange when composed), then ONE map-side-combining groupBy counts
    trips per (origin cell, destination cell). Cell = floor(a / 2^17):
    anchors are exact ints < 2^53, the divisor is a power of two, so
    the double division is exact and the floor identical cross-engine.
    """
    g = float(cell)
    w = Window.partitionBy("cust").orderBy("start_i")
    hop = stays.select(
        F.floor(F.col("ax") / g).cast("long").alias("o_cx"),
        F.floor(F.col("ay") / g).cast("long").alias("o_cy"),
        F.floor(F.lead("ax").over(w) / g).cast("long").alias("d_cx"),
        F.floor(F.lead("ay").over(w) / g).cast("long").alias("d_cy"),
    ).filter(F.col("d_cx").isNotNull())
    return hop.groupBy("o_cx", "o_cy", "d_cx", "d_cy").agg(
        F.count("*").alias("trips")
    )


def sql_od_matrix(sql_stays: str, cell: int = OD_CELL) -> str:
    g = float(cell)
    return f"""
WITH stays AS ({sql_stays}),
hop AS (
  SELECT CAST(floor(ax / {g}) AS BIGINT) AS o_cx,
         CAST(floor(ay / {g}) AS BIGINT) AS o_cy,
         CAST(floor(lead(ax) OVER (PARTITION BY cust ORDER BY start_i)
                    / {g}) AS BIGINT) AS d_cx,
         CAST(floor(lead(ay) OVER (PARTITION BY cust ORDER BY start_i)
                    / {g}) AS BIGINT) AS d_cy
  FROM stays
)
SELECT o_cx, o_cy, d_cx, d_cy, count(*) AS trips
FROM hop
WHERE d_cx IS NOT NULL
GROUP BY o_cx, o_cy, d_cx, d_cy
"""
