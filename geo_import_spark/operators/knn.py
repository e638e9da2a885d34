"""kNN via quadtree k-ring candidate expansion + window re-rank.

North-rule operator (SURVEY.md §2.5 / §4.2.4). Exact under the chosen
metric: candidates are drawn from an expanding k-ring of grid cells;
a query is *settled* once its kth candidate distance is provably
smaller than the distance to any point outside the ring
(margin = (r-1) * cell_height_deg). Unsettled queries iterate with a
doubled ring — a driver loop over a shrinking DataFrame, each pass a
single cell-equi join (no cross join ever materializes).

Metric: planar degree-space distance (dist_sq = dlon^2 + dlat^2) for
oracle-exact determinism (pure IEEE arithmetic, identical in DuckDB);
`haversine=True` switches to great-circle meters for real use.
Ties broken by point key => total order, engine-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geo_import_spark.functions import cells as cellmod

EARTH_RADIUS_M = 6371008.8


def make_ring_udf(level: int, r: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def ring_cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
        center = cellmod.cell_encode(lon.values, lat.values, level)
        return pd.Series([cellmod.k_ring(int(c), r).tolist() for c in center])

    return ring_cells


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle meters, JVM-side column expression (no UDF)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 10,
    level: int = 6,
    haversine: bool = False,
    point_key: str = "doc_id",
    max_rounds: int = 12,
) -> DataFrame:
    """queries(query_id, qlon, qlat) x points(point_key, lon, lat)
    -> (query_id, point_key, rank, dist) exact k nearest neighbors.
    """
    pts = points.select(point_key, "lon", "lat").withColumn(
        "cell_id", cellmod.cell_col(F.col("lon"), F.col("lat"), level)
    )
    pts.cache()
    sy = 180.0 / (1 << level)  # cell height in degrees (the tighter axis)

    pending = queries.select("query_id", "qlon", "qlat")
    results = None
    r = 2
    for _ in range(max_rounds):
        n_pending = pending.count()
        if n_pending == 0:
            break
        ring_udf = make_ring_udf(level, r)
        cand = (
            pending.withColumn("cell_id", F.explode(ring_udf("qlon", "qlat")))
            .join(pts, "cell_id")
        )
        if haversine:
            dist = haversine_m(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"))
        else:
            dist = F.sqrt(
                (F.col("lon") - F.col("qlon")) ** 2 + (F.col("lat") - F.col("qlat")) ** 2
            )
        cand = cand.withColumn("dist", dist)
        w = W.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col(point_key).asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        # settled: kth neighbor provably closer than any point outside the
        # ring. Planar: outside => |dlon| or |dlat| >= (r-1)*sy degrees.
        # Haversine: the x-direction bound shrinks with cos(lat) near the
        # poles, so the margin is per-query and conservative.
        agg = topk.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("dist").alias("kth")
        )
        ring_covers_world = (2 * r + 1) >= (1 << level)
        if ring_covers_world:
            settled_ids = agg.select("query_id")
        else:
            if haversine:
                agg = agg.join(pending, "query_id")
                reach = F.least(F.abs(F.col("qlat")) + (r + 1) * sy, F.lit(89.9))
                margin_col = F.lit((r - 1) * sy * 110567.0) * F.least(
                    F.lit(1.0), 2.0 * F.cos(F.radians(reach))
                )
            else:
                margin_col = F.lit(float((r - 1) * sy))
            settled_ids = agg.filter(
                (F.col("n") >= k) & (margin_col > 0) & (F.col("kth") <= margin_col)
            ).select("query_id")
        settled = topk.join(settled_ids, "query_id").select(
            "query_id", point_key, "rank", "dist"
        )
        results = settled if results is None else results.unionByName(settled)
        results = results.localCheckpoint(eager=True)  # truncate lineage per round
        pending = pending.join(settled_ids, "query_id", "left_anti")
        if ring_covers_world:
            pending = pending.limit(0)
        r *= 2
    pts.unpersist()
    return results if results is not None else queries.select("query_id").limit(0)
