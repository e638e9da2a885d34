"""Set-to-set geometry distance and containment operators: directed
Hausdorff distance (points → polygon centers) and the bbox
containment join.

Exactness (spatialstats.py conventions): coordinates are µ-degree
lattice values, so distances compare as BIGINT squared micro-degrees
— no float anywhere; containment compares the lattice coordinates
directly.

Scale: both operators put the DIMENSION-sized side (polygon layer) on
the broadcast axis and stream the point side through it — the point
table shuffles only for its own aggregate. The Hausdorff argmax uses
max_by on the already-reduced per-point minima.

Reference parity: none in geo-import — engine extension per the
brief, sibling to operators/spatialstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HAUSDORFF_SAMPLE_MOD = 4  # deterministic subset of docs: id % 4 == 0


def _udeg(col: str) -> F.Column:
    return F.round(F.col(col) * 1_000_000, 0).cast("long")


def hausdorff_to_centers(points: DataFrame, polygons: DataFrame) -> DataFrame:
    """Directed Hausdorff distance from the sampled point set to the
    polygon-center set: max over points of (min over centers of the
    exact squared µdeg distance), with the witness point.

    Output (one row): (n_points, n_centers, hausdorff_d2, worst_id) —
    worst_id = the doc number attaining the max (min doc id on ties).
    Distances are in the DOUBLED µdeg lattice (4× true µdeg²): the
    box center is (min+max)/2, and halving an odd integer sum loses
    the half-µdeg — doubling the point coordinates instead keeps the
    center exact with no division at all. (Both engines' integer
    division truncates toward zero identically — measured — so this
    is about exactness of the center, not engine divergence.)

    Plan: centers derive from the polygon layer (dimension-sized) and
    BROADCAST; per-point minima are a map-side-combined aggregate on
    the point id; the final max row uses min_by/max_by over the
    reduced minima — the point table is never shuffled at data size.
    """
    p = points.select(
        F.split(F.col("doc_id"), "-").getItem(1).cast("long").alias("id"),
        (_udeg("lon") * 2).alias("ix"), (_udeg("lat") * 2).alias("iy"),
    ).filter(F.col("id") % HAUSDORFF_SAMPLE_MOD == 0)
    c = polygons.select(
        (_udeg("minx") + _udeg("maxx")).alias("cx"),
        (_udeg("miny") + _udeg("maxy")).alias("cy"),
    )
    d2 = (
        (F.col("ix") - F.col("cx")) * (F.col("ix") - F.col("cx"))
        + (F.col("iy") - F.col("cy")) * (F.col("iy") - F.col("cy"))
    )
    mins = (
        p.crossJoin(F.broadcast(c))
        .groupBy("id", "ix", "iy")
        .agg(F.min(d2).alias("min_d2"))
    )
    counts = mins.agg(F.count(F.lit(1)).alias("n_points"))
    nc = c.agg(F.count(F.lit(1)).alias("n_centers"))
    worst = mins.agg(
        F.max("min_d2").alias("hausdorff_d2"),
        # ties: the smallest id among points attaining the max —
        # min_by of a struct keyed (-min_d2, id) would need negation;
        # instead max_by on (min_d2, -id) via struct comparison:
        F.max(F.struct(F.col("min_d2"), (-F.col("id")).alias("nid")))
        .getField("nid").alias("neg_worst_id"),
    ).select(
        "hausdorff_d2", (-F.col("neg_worst_id")).alias("worst_id")
    )
    return (
        counts.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(worst))
        .select("n_points", "n_centers", "hausdorff_d2", "worst_id")
    )


def sql_hausdorff(sql_points: str, sql_polygons: str) -> str:
    return f"""
WITH pts AS ({sql_points}), polys AS ({sql_polygons}),
p AS (
  SELECT CAST(split_part(doc_id, '-', 2) AS BIGINT) AS id,
         CAST(round(lon * 1000000, 0) AS BIGINT) * 2 AS ix,
         CAST(round(lat * 1000000, 0) AS BIGINT) * 2 AS iy
  FROM pts
  WHERE CAST(split_part(doc_id, '-', 2) AS BIGINT) % {HAUSDORFF_SAMPLE_MOD} = 0
),
c AS (
  SELECT CAST(round(minx * 1000000, 0) AS BIGINT)
           + CAST(round(maxx * 1000000, 0) AS BIGINT) AS cx,
         CAST(round(miny * 1000000, 0) AS BIGINT)
           + CAST(round(maxy * 1000000, 0) AS BIGINT) AS cy
  FROM polys
),
mins AS (
  SELECT id, MIN((ix - cx) * (ix - cx) + (iy - cy) * (iy - cy)) AS min_d2
  FROM p, c GROUP BY id, ix, iy
)
SELECT (SELECT count(*) FROM mins) AS n_points,
       (SELECT count(*) FROM c) AS n_centers,
       (SELECT MAX(min_d2) FROM mins) AS hausdorff_d2,
       (SELECT MIN(id) FROM mins
        WHERE min_d2 = (SELECT MAX(min_d2) FROM mins)) AS worst_id
"""


def containment_pairs(polygons: DataFrame) -> DataFrame:
    """Strict bbox containment join over the rectangle layer: pairs
    (outer, inner) where outer's box contains inner's box with
    positive margin on every side, outer ≠ inner.

    Output: (outer_id, inner_id).

    Plan: the polygon layer is dimension-sized, so the theta join
    runs as BroadcastNestedLoop over the broadcast side — the
    containment predicate compares exact lattice µdeg coordinates.
    At a data-sized polygon table the standard upgrade is an interval
    (cell-cover) equi-join prefilter, exactly the pip_join pattern.
    """
    u = lambda c: _udeg(c)
    a = polygons.select(
        F.col("poly_id").alias("outer_id"),
        u("minx").alias("ax0"), u("miny").alias("ay0"),
        u("maxx").alias("ax1"), u("maxy").alias("ay1"),
    )
    b = polygons.select(
        F.col("poly_id").alias("inner_id"),
        u("minx").alias("bx0"), u("miny").alias("by0"),
        u("maxx").alias("bx1"), u("maxy").alias("by1"),
    )
    cond = (
        (F.col("ax0") < F.col("bx0")) & (F.col("ay0") < F.col("by0"))
        & (F.col("ax1") > F.col("bx1")) & (F.col("ay1") > F.col("by1"))
    )
    return (
        a.join(F.broadcast(b), cond)
        .filter(F.col("outer_id") != F.col("inner_id"))
        .select("outer_id", "inner_id")
    )


def sql_containment(sql_polygons: str) -> str:
    u = lambda c: f"CAST(round({c} * 1000000, 0) AS BIGINT)"
    return f"""
WITH polys AS ({sql_polygons})
SELECT a.poly_id AS outer_id, b.poly_id AS inner_id
FROM polys a JOIN polys b
  ON {u('a.minx')} < {u('b.minx')} AND {u('a.miny')} < {u('b.miny')}
 AND {u('a.maxx')} > {u('b.maxx')} AND {u('a.maxy')} > {u('b.maxy')}
 AND a.poly_id <> b.poly_id
"""
