"""Raster-tile (z/x/y quadkey) assignment for media spans.

North-rule operator (no reference counterpart; geo-import only passes
blobs through, es6-lib/upstream/core.js:248-263). A media span is
located at its document's geometry anchor (first geometry span); the
tile id is the standard Web-Mercator slippy tile + Bing quadkey,
computed in one vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geo_import_spark.functions import tiles as tilemod

TILE_TYPE = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("quadkey", T.StringType()),
    ]
)


def make_tile_udf(z: int):
    @pandas_udf(TILE_TYPE)
    def tile_assign(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = tilemod.tile_xy(lon.values, lat.values, z)
        return pd.DataFrame({"x": x, "y": y, "quadkey": tilemod.quadkey_list(x, y, z)})

    return tile_assign


def media_spans(documents: DataFrame) -> DataFrame:
    """documents -> one row per media span (doc_id, span_offset, media_ref)."""
    s = documents.select("doc_id", F.explode("spans").alias("span"))
    return s.filter(F.col("span.kind") == "media").select(
        "doc_id",
        F.col("span.offset").alias("span_offset"),
        F.col("span.media_ref").alias("media_ref"),
    )


def assign_tiles(documents: DataFrame, anchors: DataFrame, z: int = 12) -> DataFrame:
    """Tile-assign every media span.

    anchors: (doc_id, lon, lat) — the document's first geometry span
    location (points source). Join is on doc_id; the anchor side is
    deduplicated to the min span_offset geometry per doc.
    Output: (doc_id, span_offset, media_ref, z, x, y, quadkey).
    """
    media = media_spans(documents)
    tile_udf = make_tile_udf(z)
    out = (
        media.join(anchors.select("doc_id", "lon", "lat"), "doc_id")
        .withColumn("tile", tile_udf("lon", "lat"))
        .select(
            "doc_id",
            "span_offset",
            "media_ref",
            F.lit(z).alias("z"),
            F.col("tile.x").alias("x"),
            F.col("tile.y").alias("y"),
            F.col("tile.quadkey").alias("quadkey"),
        )
    )
    return out


def assign_tiles_from_anchors(media: DataFrame, anchors: DataFrame, z: int = 12) -> DataFrame:
    """Tile-assign media spans against a prepared anchors frame,
    preserving any extra anchor columns (e.g. the checkpoint `unit`).
    anchors: (doc_id, lon, lat[, ...]); media: (doc_id, span_offset,
    media_ref)."""
    tile_udf = make_tile_udf(z)
    extra = [c for c in anchors.columns if c not in ("doc_id", "lon", "lat")]
    return (
        media.join(anchors, "doc_id")
        .withColumn("tile", tile_udf("lon", "lat"))
        .select(
            "doc_id",
            "span_offset",
            "media_ref",
            F.lit(z).alias("z"),
            F.col("tile.x").alias("x"),
            F.col("tile.y").alias("y"),
            F.col("tile.quadkey").alias("quadkey"),
            *extra,
        )
    )


def first_geometry_anchor(points: DataFrame) -> DataFrame:
    """Per-doc anchor = geometry span with the smallest span_offset.

    min_by aggregation, not a row_number window: the aggregate gets
    map-side partial combine (each input partition ships one candidate
    row per doc instead of every geometry span through the shuffle),
    which at 10^12 spans is the difference between shuffling the
    whole table and shuffling ~|docs| rows."""
    return points.groupBy("doc_id").agg(
        F.min_by("lon", "span_offset").alias("lon"),
        F.min_by("lat", "span_offset").alias("lat"),
    )
