"""Pass-2 geometry normalization: fix semantics (linify, close rings)
and reproject to WGS84 — the engine's WGS84Reprojector
(es6-lib/decoders/wgs84-reprojector.js:43-71 + soql/geom.js:10-16).

One pandas UDF over the flat geometry struct: per Arrow batch, rows
are grouped by CRS and ALL coordinates of a CRS group are transformed
in a single vectorized NumPy call (projection.py) — per-row Python is
limited to O(rings) offset surgery for the semantics fixes.

Arity violations are caught at parse time (sources/*), so this stage
only transforms; the reproject skip when src == WGS84
(soql/geom.js:11-15) happens per CRS group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from geo_import_spark.functions import geomkern, projection
from geo_import_spark.sources.geojson import GEOM_TYPE


@pandas_udf(GEOM_TYPE)
def fix_and_reproject(geom: pd.DataFrame, crs: pd.Series) -> pd.DataFrame:
    n = len(crs)
    out = {
        "gtype": [None] * n,
        "part_offsets": [None] * n,
        "ring_offsets": [None] * n,
        "xs": [None] * n,
        "ys": [None] * n,
    }
    fixed = []
    for i in range(n):
        gt = geom["gtype"].iloc[i] if "gtype" in geom else None
        if gt is None or (isinstance(gt, float) and pd.isna(gt)):
            fixed.append(None)
            continue
        fixed.append(
            geomkern.fix_semantics(
                gt,
                list(geom["part_offsets"].iloc[i]),
                list(geom["ring_offsets"].iloc[i]),
                list(geom["xs"].iloc[i]),
                list(geom["ys"].iloc[i]),
            )
        )

    # group rows by CRS; one vectorized transform per group
    crs_vals = crs.fillna("").values
    for tag in pd.unique(crs_vals):
        idx = [i for i in range(n) if crs_vals[i] == tag and fixed[i] is not None]
        if not idx:
            continue
        lens = [len(fixed[i][3]) for i in idx]
        starts = np.concatenate([[0], np.cumsum(lens)])
        all_x = np.concatenate([np.asarray(fixed[i][3], dtype=np.float64) for i in idx]) \
            if sum(lens) else np.array([])
        all_y = np.concatenate([np.asarray(fixed[i][4], dtype=np.float64) for i in idx]) \
            if sum(lens) else np.array([])
        lon, lat = projection.to_wgs84(tag or None, all_x, all_y)
        for k, i in enumerate(idx):
            a, b = starts[k], starts[k + 1]
            gt, po, ro, _, _ = fixed[i]
            out["gtype"][i] = gt
            out["part_offsets"][i] = po
            out["ring_offsets"][i] = ro
            out["xs"][i] = np.asarray(lon[a:b]).tolist()
            out["ys"][i] = np.asarray(lat[a:b]).tolist()
    return pd.DataFrame(out)


def reproject_layers(assigned: DataFrame) -> DataFrame:
    """Replace `geom` with the fixed + WGS84-reprojected geometry.
    Null geometries stay null."""
    g2 = fix_and_reproject("geom", "crs")
    return assigned.withColumn(
        "geom",
        F.when(F.col("geom").isNull(), F.lit(None).cast(GEOM_TYPE)).otherwise(g2),
    ).withColumn("crs", F.lit("EPSG:4326"))


def wgs84_bbox(df: DataFrame) -> dict:
    """Mega-bbox over reprojected geometry (util/bbox.js fold with the
    lat/lon range guard; services/spatial.js:318-345)."""
    guard = df.select(
        F.array_min(F.filter("geom.xs", lambda v: (v >= -180) & (v <= 180))).alias("nx"),
        F.array_min(F.filter("geom.ys", lambda v: (v >= -90) & (v <= 90))).alias("ny"),
        F.array_max(F.filter("geom.xs", lambda v: (v >= -180) & (v <= 180))).alias("xx"),
        F.array_max(F.filter("geom.ys", lambda v: (v >= -90) & (v <= 90))).alias("xy"),
    )
    row = guard.agg(
        F.min("nx").alias("minx"),
        F.min("ny").alias("miny"),
        F.max("xx").alias("maxx"),
        F.max("xy").alias("maxy"),
    ).collect()[0]
    return {"minx": row["minx"], "miny": row["miny"],
            "maxx": row["maxx"], "maxy": row["maxy"]}
