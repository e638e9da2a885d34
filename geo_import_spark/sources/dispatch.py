"""Decoder dispatch (reference S5: es6-lib/decoders/index.js:9-24 —
content-type / file-extension -> decoder class).

Span-world equivalent: a `format` tag per geometry span (or a default
for the whole table) routes each span subset to its parse UDF; the
per-format streams are unioned back into one parsed-feature frame.
Filter + union (not a per-row CASE over different UDFs) keeps each
pandas UDF monomorphic and lets Catalyst prune unused branches when
only one format is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_TYPES = {
    # content-type -> format tag (decoders/index.js canDecode())
    "application/vnd.geo+json": "geojson",
    "application/json": "geojson",
    "application/vnd.google-earth.kml+xml": "kml",
    "application/vnd.google-earth.kmz": "kmz",
    "application/zip": "shapefile",
    "application/octet-stream": "shapefile",
    # engine extension: WKT text (PostGIS ST_AsText interchange)
    "text/vnd.wkt": "wkt",
}

EXTENSIONS = {
    ".json": "geojson",
    ".geojson": "geojson",
    ".kml": "kml",
    ".kmz": "kmz",
    ".zip": "shapefile",
    ".wkt": "wkt",
}


def format_for_content_type(ct: str) -> str:
    try:
        return CONTENT_TYPES[ct.split(";")[0].strip().lower()]
    except KeyError:
        raise ValueError(f"no decoder for content type {ct!r}") from None


def format_for_extension(name: str) -> str:
    ext = "." + name.rsplit(".", 1)[-1].lower() if "." in name else ""
    try:
        return EXTENSIONS[ext]
    except KeyError:
        raise ValueError(f"no decoder for extension {ext!r}") from None


def decode_geometry_spans(documents: DataFrame, format_col: str = "format") -> DataFrame:
    """documents with a per-document `format` column -> unified parsed
    features (doc_id, span_offset, geom, properties, props, crs,
    error), one decoder per format subset, unioned."""
    from geo_import_spark.sources import geojson, kml, shapefile, wkt

    s = documents.select(
        "doc_id", F.col(format_col).alias("_fmt"), F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "geometry")

    def unpack(df, parse_udf):
        g = df.select(
            "doc_id",
            F.col("span.offset").alias("span_offset"),
            F.explode(parse_udf(F.col("span.text"))).alias("f"),
        )
        return g.select(
            "doc_id",
            "span_offset",
            F.col("f.geom").alias("geom"),
            F.col("f.properties").alias("properties"),
            F.col("f.props").alias("props"),
            F.col("f.crs").alias("crs"),
            F.col("f.error").alias("error"),
        )

    parts = []
    routes = {
        "kml": kml.make_kml_features_udf(),
        "kmz": kml.make_kml_features_udf(kmz=True),
        "shapefile": shapefile.make_shapefile_features_udf(),
    }
    for fmt, scalar_udf in (("geojson", geojson.parse_feature),
                            ("wkt", wkt.parse_wkt)):
        gj = s.filter(F.col("_fmt") == fmt)
        parts.append(
            gj.select(
                "doc_id",
                F.col("span.offset").alias("span_offset"),
                scalar_udf(F.col("span.text")).alias("f"),
            ).select(
                "doc_id",
                "span_offset",
                F.col("f.geom").alias("geom"),
                F.col("f.properties").alias("properties"),
                F.col("f.props").alias("props"),
                F.col("f.crs").alias("crs"),
                F.col("f.error").alias("error"),
            )
        )
    for fmt, udf in routes.items():
        parts.append(unpack(s.filter(F.col("_fmt") == fmt), udf))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
