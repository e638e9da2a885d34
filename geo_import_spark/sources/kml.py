"""KML / KMZ span decoding — Spark-first replacement for the
reference's expat SAX decoder (es6-lib/decoders/kml.js, kmz.js).

A geometry span (or blob) carries a whole KML document; parsing runs
batch-at-a-time inside a pandas UDF / flat-map, one `iterparse` pass
per document (same event order as the reference's SAX stream), and
fans out to one row per emitted feature.

Parity semantics (kml.js):
- Placemark → feature(s); name/description/ExtendedData Data@name /
  SchemaData SimpleData@name become attributes (kml.js:149-212)
- MultiGeometry fan-out: geometries inside <MultiGeometry> merge into
  Multi* features per type; a second type clones the attributes into
  a NEW feature — one Placemark → N rows (kml.js:83-109)
- <Schema><SimpleField type=…> casts: int/float/number/double →
  number, boolean → lowercase=='true', null → null, else string
  (kml.js:111-119, 409-422)
- No schema → guess: '' → null, Number(v) not NaN → number, else
  string (kml.js:392-396); values trimmed
- coordinates: 'x,y[,z]' — z sliced off (kml.js:122-140)
- CRS is hardwired WGS84 (kml.js:20)
- KMZ: unzip, every *.kml entry parsed, rows concatenated
  (kmz.js:18-134); multi_layer.kmz → 28 rows golden (kmz.js:394-406)
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

KML_CRS = "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"

_SINGLE = {"point": "Point", "linestring": "LineString", "polygon": "Polygon"}
_MULTI = {"point": "MultiPoint", "linestring": "MultiLineString", "polygon": "MultiPolygon"}


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _parse_coord(token: str):
    parts = token.split(",")
    return [float(parts[0]), float(parts[1])]  # z sliced off


def _decode0(text: str):
    return _parse_coord(text.strip())


def _decode1(text: str):
    out = []
    for seg in text.strip().split("\n"):
        for tok in re.split(r"\s+", seg.strip()):
            if tok:
                out.append(_parse_coord(tok))
    return out


_JS_DEC_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _js_number(v: str):
    """JS Number(v) semantics for the guesser (kml.js:392-396): ''
    handled earlier; returns None when NaN. Python float() diverges
    from JS Number() on several literals, so the grammar is validated
    explicitly: '1_0' is NaN in JS (Python float accepts it), '0x10'
    is 16 (Python rejects), 'inf'/'nan' spellings are NaN in JS
    (Python accepts), and hex/binary/octal take no sign."""
    if v in ("Infinity", "+Infinity", "-Infinity"):
        return float(v.replace("Infinity", "inf"))
    if re.fullmatch(r"0[xX][0-9a-fA-F]+", v):
        return float(int(v, 16))
    if re.fullmatch(r"0[bB][01]+", v):
        return float(int(v, 2))
    if re.fullmatch(r"0[oO][0-7]+", v):
        return float(int(v, 8))
    if _JS_DEC_RE.fullmatch(v):
        return float(v)
    return None


def _guess(value: str):
    """kml.js:392-396 — returns (typed value, ctype)."""
    if value == "":
        return None, "null"
    n = _js_number(value)
    if n is not None:
        return n, "number"
    return value, "string"


def _cast(value: str, declared: str):
    """kml.js type-cast table (111-119). Unknown declared type →
    string passthrough."""
    value = value.strip()
    if declared == "int":
        m = re.match(r"\s*[-+]?\d+", value)
        return (float(m.group()) if m else None), "number"
    if declared in ("float", "number", "double"):
        return _js_number(value), "number"
    if declared == "boolean":
        return value.lower() == "true", "boolean"
    if declared == "null":
        return None, "null"
    return value, "string"


def _declare_missing_prefixes(data: bytes) -> bytes:
    """Real-world KML often uses namespace prefixes it never declares
    (e.g. a bare `xsi:schemaLocation` — smoke terrassa.kml). The
    reference's SAX parser shrugs; ElementTree raises 'unbound
    prefix'. Declare every used-but-undeclared prefix on the root
    element with a placeholder URI (only the localname matters
    downstream — _localname strips namespaces everywhere)."""
    import re

    text = data.decode("utf-8", "replace")
    used = set(re.findall(r"</?([A-Za-z_][\w.-]*):", text)) | set(
        re.findall(r"\s([A-Za-z_][\w.-]*):[A-Za-z_][\w.-]*\s*=", text)
    )
    declared = set(re.findall(r"xmlns:([A-Za-z_][\w.-]*)", text))
    missing = sorted(used - declared - {"xml", "xmlns"})
    if not missing:
        return data
    decls = "".join(f' xmlns:{p}="urn:x-undeclared:{p}"' for p in missing)
    # inject on the root element's open tag (first tag that is not a
    # prolog/comment/doctype)
    patched = re.sub(
        r"(<[A-Za-z_][\w.:-]*)([\s>])", lambda m: m.group(1) + decls + m.group(2),
        text, count=1,
    )
    return patched.encode("utf-8")


def parse_kml_document(data: bytes | str) -> list[dict]:
    """One KML document -> list of feature rows:
    {geom: {'type': CamelCase, 'coordinates': …} | None,
     properties: [(name, value, ctype), …] in encounter order}.

    Strict XML parse first; on a parse error retry once with
    used-but-undeclared namespace prefixes declared (lenient-parser
    parity with the reference on messy real-world KML)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    try:
        return _parse_kml_strict(data)
    except ElementTree.ParseError:
        return _parse_kml_strict(_declare_missing_prefixes(data))


def _parse_kml_strict(data: bytes) -> list[dict]:
    schema: dict[str, str] = {}
    rows: list[dict] = []

    # Per-placemark state (mirrors kml.js state machine)
    features: list[dict] = []
    ring_stack: list = []
    in_multi = 0
    in_placemark = 0

    def new_feature():
        return {"geom": None, "props": []}

    def set_or_clone(kind: str, coords, multi: bool):
        gtype = (_MULTI if multi else _SINGLE)[kind]
        for f in features:
            if f["geom"] is None or f["geom"]["type"] == gtype:
                if f["geom"] is None:
                    f["geom"] = {"type": gtype, "coordinates": [] if multi else None}
                if multi:
                    f["geom"]["coordinates"].append(coords)
                else:
                    f["geom"]["coordinates"] = coords
                return
        clone = {"geom": {"type": gtype, "coordinates": [coords] if multi else coords},
                 "props": list(features[0]["props"])}
        features.append(clone)

    def set_attr(name: str, raw: str):
        if name in schema:
            value, ctype = _cast(raw, schema[name])
        else:
            value, ctype = _guess(raw.strip())
        for f in features:
            props = f["props"]
            for idx, (n, _v, _t) in enumerate(props):
                if n == name:  # re-set keeps original position (JS object)
                    props[idx] = (name, value, ctype)
                    break
            else:
                props.append((name, value, ctype))

    path: list[str] = []
    for event, elem in ElementTree.iterparse(io.BytesIO(data), events=("start", "end")):
        tag = _localname(elem.tag)
        if event == "start":
            path.append(tag)
            if tag == "placemark":
                in_placemark += 1
                features = [new_feature()]
            elif tag == "multigeometry":
                in_multi += 1
            elif tag == "polygon":
                ring_stack = []
            continue

        # end events
        if tag == "simplefield" and "schema" in path:
            name = elem.get("name")
            if name is not None:
                schema[name] = (elem.get("type") or "").lower()
        elif in_placemark:
            text = elem.text or ""
            if tag in ("name", "description") and path[-2:-1] == ["placemark"]:
                set_attr(tag, text)
            elif tag == "data":
                name = elem.get("name")
                value_el = next(
                    (c for c in elem if _localname(c.tag) == "value"), None
                )
                if name is not None and value_el is not None:
                    set_attr(name, value_el.text or "")
            elif tag == "simpledata":
                name = elem.get("name")
                if name is not None:
                    set_attr(name, text)
            elif tag == "point":
                coords = _find_coords(elem, _decode0)
                if coords is not None:
                    set_or_clone("point", coords, in_multi > 0)
            elif tag == "linestring":
                coords = _find_coords(elem, _decode1)
                if coords is not None:
                    set_or_clone("linestring", coords, in_multi > 0)
            elif tag == "polygon":
                rings = []
                for boundary in ("outerboundaryis", "innerboundaryis"):
                    for b in elem.iter():
                        if _localname(b.tag) == boundary:
                            c = _find_coords(b, _decode1)
                            if c is not None:
                                rings.append(c)
                set_or_clone("polygon", rings, in_multi > 0)
            elif tag == "multigeometry":
                in_multi -= 1
            elif tag == "placemark":
                in_placemark -= 1
                for f in features:
                    if f["geom"] is not None:
                        rows.append(
                            {"geom": f["geom"], "properties": f["props"]}
                        )
                features = []
                elem.clear()  # safe: all placemark handlers have run
        path.pop()
    return rows


def _find_coords(elem, decoder):
    for c in elem.iter():
        if _localname(c.tag) == "coordinates" and c.text and c.text.strip():
            return decoder(c.text)
    return None


def parse_kmz(data: bytes) -> list[dict]:
    """KMZ bytes -> concatenated rows from every *.kml entry
    (kmz.js:18-134). Entries processed in zip order."""
    rows: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.filename.lower().endswith(".kml") and not info.is_dir():
                rows.extend(parse_kml_document(zf.read(info)))
    return rows


# --- Spark wrappers ---------------------------------------------------------

def _features_udf_types():
    from pyspark.sql import types as T

    from geo_import_spark.sources.geojson import GEOM_TYPE, PROPS_TYPE

    feature = T.StructType(
        [
            T.StructField("geom", GEOM_TYPE),
            T.StructField("properties", T.StringType()),
            T.StructField("props", PROPS_TYPE),
            T.StructField("crs", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )
    return T.ArrayType(feature)


def _row_to_feature(row: dict, crs: str = KML_CRS):
    """Parsed feature dict -> the unified PARSED_FEATURE tuple.
    (Shared by the KML/KMZ and shapefile sources.)"""
    import json as _json

    from geo_import_spark.functions import geomkern

    geom = row["geom"]
    props = []
    obj = {}
    for name, value, ctype in row["properties"]:
        if ctype == "null":
            props.append((name, None, "null"))
            obj[name] = None
        elif ctype == "number":
            props.append((name, repr(float(value)), "number"))
            obj[name] = value
        elif ctype == "boolean":
            props.append((name, "true" if value else "false", "boolean"))
            obj[name] = value
        else:
            props.append((name, str(value), "string"))
            obj[name] = value
    props_json = _json.dumps(obj, separators=(",", ":"))
    if geom is None:
        return (None, props_json, props, crs, None)
    try:
        po, ro, xs, ys = geomkern.flatten_geojson_coords(
            geom["type"], geom["coordinates"]
        )
    except ValueError as e:
        return (None, props_json, props, crs, str(e))
    # G6 vertex guard on EVERY decoder path (KML/KMZ/shapefile route
    # through here), matching layer-write enforcement in the
    # reference (es6-lib/decoders/layer.js:254-258, maxVerticesPerRow
    # config/config.js:26).
    if len(xs) > geomkern.MAX_VERTICES_PER_ROW:
        return (None, props_json, props, crs, "too many vertices")
    if not xs:
        # P5: empty coords -> SoQLNull geometry (soql/mapper.js:32-46)
        return (None, props_json, props, crs, None)
    return ((geom["type"], po, ro, xs, ys), props_json, props, crs, None)


def make_kml_features_udf(kmz: bool = False):
    """pandas UDF: KML document text (or base64 KMZ when kmz=True) ->
    array of parsed features (explode outside)."""
    import base64

    from pyspark.sql.functions import pandas_udf

    def parse(texts):
        import pandas as pd
        out = []
        for t in texts:
            try:
                rows = (
                    parse_kmz(base64.b64decode(t)) if kmz else parse_kml_document(t)
                )
                out.append([_row_to_feature(r) for r in rows])
            except Exception as e:  # malformed_kml golden: error, not crash
                out.append([(None, None, None, KML_CRS, f"kml parse error: {e}")])
        return pd.Series(out)

    return pandas_udf(_features_udf_types())(parse)


def kml_geometry_spans(documents, fmt_col: str = "format"):
    """documents whose geometry spans carry KML text -> exploded
    parsed features (doc_id, span_offset, geom, properties, props,
    crs, error) — union-compatible with geojson.geometry_spans."""
    from pyspark.sql import functions as F

    parse = make_kml_features_udf()
    s = documents.select("doc_id", F.explode("spans").alias("span")).filter(
        F.col("span.kind") == "geometry"
    )
    g = s.select(
        "doc_id",
        F.col("span.offset").alias("span_offset"),
        F.explode(parse(F.col("span.text"))).alias("f"),
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
