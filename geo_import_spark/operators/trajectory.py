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
