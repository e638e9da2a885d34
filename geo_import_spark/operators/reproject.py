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
    """Whole-batch vectorized path (VERDICT r2 #6): ring surgery runs
    as ONE NumPy pass over batch-flat coordinate arrays
    (geomkern.batch_fix_rings — per-row Python is O(rows) offset
    bookkeeping, never per-vertex), then each CRS group of the flat
    arrays is transformed in one vectorized projection call and split
    back per row."""
    n = len(crs)
    out = {
        "gtype": [None] * n,
        "part_offsets": [None] * n,
        "ring_offsets": [None] * n,
        "xs": [None] * n,
        "ys": [None] * n,
    }
    gt_col = geom["gtype"] if "gtype" in geom else pd.Series([None] * n)
    valid = gt_col.notna().values
    if not valid.any():
        return pd.DataFrame(out)
    vidx = np.nonzero(valid)[0]
    gts = gt_col.values[vidx]
    po_l = geom["part_offsets"].values[vidx]
    new_ro, flat_x, flat_y, row_bounds = geomkern.batch_fix_rings(
        gts,
        geom["ring_offsets"].values[vidx],
        geom["xs"].values[vidx],
        geom["ys"].values[vidx],
    )

    # one vectorized transform per CRS group, scattered over the flats
    codes, uniq = pd.factorize(crs.fillna("").values[vidx])
    coord_codes = np.repeat(codes, np.diff(row_bounds))
    lon = np.empty_like(flat_x)
    lat = np.empty_like(flat_y)
    for t, tag in enumerate(uniq):
        m = coord_codes == t
        lon[m], lat[m] = projection.to_wgs84(tag or None, flat_x[m], flat_y[m])

    xs_rows = np.split(lon, row_bounds[1:-1])
    ys_rows = np.split(lat, row_bounds[1:-1])
    for k, i in enumerate(vidx):
        out["gtype"][i] = gts[k]
        out["part_offsets"][i] = list(po_l[k])
        out["ring_offsets"][i] = new_ro[k]
        out["xs"][i] = xs_rows[k].tolist()
        out["ys"][i] = ys_rows[k].tolist()
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
