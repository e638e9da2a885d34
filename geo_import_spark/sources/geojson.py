"""GeoJSON span decoding — the Spark-first replacement for the
reference's streaming SAX decoder (es6-lib/decoders/geojson.js:15-69 +
util/parser.js). Instead of a byte-stream parser feeding a row pipe,
the engine explodes `documents.spans`, routes `kind='geometry'` spans
to a **batched pandas UDF** that parses GeoJSON Feature JSON per Arrow
batch and emits the flat geometry struct + properties JSON + CRS.

Per-feature CRS override / collection default CRS semantics follow
es6-lib/decoders/merger.js:22 (default urn:ogc:def:crs:OGC:1.3:CRS84).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geo_import_spark.functions import geomkern

DEFAULT_CRS = "urn:ogc:def:crs:OGC:1.3:CRS84"  # merger.js:22

GEOM_TYPE = T.StructType(
    [
        T.StructField("gtype", T.StringType()),
        T.StructField("part_offsets", T.ArrayType(T.IntegerType())),
        T.StructField("ring_offsets", T.ArrayType(T.IntegerType())),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ]
)

PROPS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),  # display string; None for null
            T.StructField("ctype", T.StringType()),  # string|number|boolean|null|array
        ]
    )
)

PARSED_FEATURE_TYPE = T.StructType(
    [
        T.StructField("geom", GEOM_TYPE),
        T.StructField("properties", T.StringType()),  # canonical JSON (insertion order)
        T.StructField("props", PROPS_TYPE),  # ordered typed columns (layer merge)
        T.StructField("crs", T.StringType()),
        T.StructField("error", T.StringType()),  # error side-channel (G2 arity etc.)
    ]
)


def typed_props(props: dict) -> list[tuple]:
    """JS-typeof property typing (transform.js:32-37) in insertion
    order, value rendered as a plain display string."""
    out = []
    for k, v in props.items():
        if v is None:
            out.append((k, None, "null"))
        elif isinstance(v, bool):
            out.append((k, "true" if v else "false", "boolean"))
        elif isinstance(v, (int, float)):
            out.append((k, repr(float(v)), "number"))
        elif isinstance(v, list):
            out.append((k, json.dumps(v), "array"))
        else:
            sv = str(v)
            if sv == "\u0000":  # SoQLText NUL coercion, soql/text.js:13
                sv = ""
            out.append((k, sv, "string"))
    return out


def _parse_one(txt: str, default_crs: str):
    """One GeoJSON Feature (or bare geometry) -> row tuple.

    Validation mirrors transform.js:12-29: missing/invalid type,
    missing geometry, linked (href) CRS -> error row."""
    empty_geom = None
    try:
        obj = json.loads(txt)
    except (ValueError, TypeError) as e:
        return (empty_geom, None, None, default_crs, f"malformed json: {e}")
    if not isinstance(obj, dict):
        return (empty_geom, None, None, default_crs, "feature is not an object")
    if obj.get("type") == "Feature":
        geometry = obj.get("geometry")
        props = obj.get("properties") or {}
        crs_obj = obj.get("crs")
    elif obj.get("type") in geomkern.GEOM_TYPES:
        geometry, props, crs_obj = obj, {}, None
    else:
        return (empty_geom, None, None, default_crs, f"invalid type {obj.get('type')!r}")
    crs = default_crs
    if isinstance(crs_obj, dict):
        if crs_obj.get("type") == "link" or "href" in (crs_obj.get("properties") or {}):
            return (empty_geom, None, None, default_crs, "linked CRS not supported")
        crs = (crs_obj.get("properties") or {}).get("name", default_crs)
    props_json = json.dumps(props, separators=(",", ":"))
    tp = typed_props(props)
    if geometry is None:
        return (None, props_json, tp, crs, None)  # null geometry -> SoQLNull (P4)
    gtype = geometry.get("type")
    if gtype not in geomkern.GEOM_TYPES:
        return (empty_geom, props_json, tp, crs, f"invalid geometry type {gtype!r}")
    try:
        po, ro, xs, ys = geomkern.flatten_geojson_coords(gtype, geometry.get("coordinates"))
    except ValueError as e:
        return (empty_geom, props_json, tp, crs, str(e))
    if len(xs) > geomkern.MAX_VERTICES_PER_ROW:
        return (empty_geom, props_json, tp, crs, "too many vertices")
    if not xs:
        # P5: empty coordinate list -> SoQLNull geometry IN-ENGINE
        # (soql/mapper.js:32-46); the layer may later type the column
        # from other rows (layer.js:214-236).
        return (None, props_json, tp, crs, None)
    return ((gtype, po, ro, xs, ys), props_json, tp, crs, None)


@pandas_udf(PARSED_FEATURE_TYPE)
def parse_feature(texts: pd.Series) -> pd.DataFrame:
    rows = [_parse_one(t, DEFAULT_CRS) for t in texts]
    return pd.DataFrame(
        {
            "geom": [r[0] for r in rows],
            "properties": [r[1] for r in rows],
            "props": [r[2] for r in rows],
            "crs": [r[3] for r in rows],
            "error": [r[4] for r in rows],
        }
    )


def geometry_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one row per geometry span with parsed
    flat geometry. The replacement for decoder → merger pass 1."""
    s = documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("span_offset"),
    )
    g = s.filter(F.col("kind") == "geometry").withColumn("parsed", parse_feature("text"))
    return g.select(
        "doc_id",
        "span_offset",
        F.col("parsed.geom").alias("geom"),
        F.col("parsed.properties").alias("properties"),
        F.col("parsed.props").alias("props"),
        F.col("parsed.crs").alias("crs"),
        F.col("parsed.error").alias("error"),
    )


POINT_FEATURE_SCHEMA = (
    "struct<type:string, geometry:struct<type:string, coordinates:array<double>>, "
    "coordinates:array<double>, crs:struct<properties:struct<name:string>>>"
)


def point_spans(documents: DataFrame) -> DataFrame:
    """Geometry spans narrowed to Points as plain (lon, lat) doubles —
    the hot-path representation for the PIP/kNN/tiling joins.

    Parsed 100% JVM-side (from_json / get_json_object inside
    whole-stage codegen): at 10^12-document scale the Python decoder
    would dominate the job; the generic pandas-UDF decoder
    (geometry_spans) remains the layer-normalization path where the
    full type machinery is needed."""
    s = documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "geometry")
    # Null out non-object text BEFORE the JSON parse. The validity
    # predicates below get pushed down and collapsed into the kind
    # filter, where the codegen'd predicate hoists its from_json
    # subexpressions EAGERLY — so without this guard Jackson parses
    # (and throws a deep-stack JsonParseException on) every text/media
    # span in the corpus. A null input short-circuits from_json /
    # get_json_object to null with no parser call at all.
    jtxt = F.when(F.col("span.text").startswith("{"), F.col("span.text"))
    f = s.select(
        "doc_id",
        F.col("span.offset").alias("span_offset"),
        F.from_json(jtxt, POINT_FEATURE_SCHEMA).alias("f"),
        F.get_json_object(jtxt, "$.properties").alias("properties"),
    )
    # Accept BOTH Feature-wrapped Points and bare Point geometry spans,
    # matching the pandas path (geometry_spans/_parse_one) so the two
    # parse paths agree on which rows exist.
    coords = F.when(F.col("f.type") == "Feature", F.col("f.geometry.coordinates")).when(
        F.col("f.type") == "Point", F.col("f.coordinates")
    )
    f = f.withColumn("pt", coords)
    return f.filter(
        (
            ((F.col("f.type") == "Feature") & (F.col("f.geometry.type") == "Point"))
            | (F.col("f.type") == "Point")
        )
        & (F.size("pt") == 2)
    ).select(
        "doc_id",
        "span_offset",
        F.col("pt")[0].alias("lon"),
        F.col("pt")[1].alias("lat"),
        F.coalesce(F.col("properties"), F.lit("{}")).alias("properties"),
        F.coalesce(F.col("f.crs.properties.name"), F.lit(DEFAULT_CRS)).alias("crs"),
    )
