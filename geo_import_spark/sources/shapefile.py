"""Shapefile (.zip of .shp/.dbf/.prj) span decoding — Spark-first
replacement for the reference's zip + mbostock/shapefile stream
(es6-lib/decoders/shapefile.js:61-334). Pure-stdlib/struct binary
parse inside a pandas UDF batch; no native libs.

Parity semantics:
- zip entries grouped into (.shp, .dbf, .prj) triples by basename,
  triples processed sorted by name (shapefile.js:211); hidden files
  skipped; missing .shp or .dbf -> error (shapefile.js:28-58)
- .prj WKT -> CRS; absent -> WGS84 default (shapefile.js:28)
- geometry promotion: Polygon -> MultiPolygon, LineString ->
  MultiLineString (wrap one level, shapefile.js:121-131)
- records without geometry skipped; null coords -> [] (111-116)
- DBF C -> string, N/F -> number (blank -> null), L -> boolean,
  D -> ISO date string
"""

from __future__ import annotations

import io
import struct
import zipfile

DEFAULT_PRJ = "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8

# Z (11-18) and M (21-28) shape variants append z/m ranges+arrays AFTER
# the XY payload, so the XY parse is offset-identical to the base type
# — map each to its base and ignore the trailing arrays (the reference's
# shapefile lib reads XY the same way; smoke fixtures xNeighbourhood
# (PolygonM=25) and CATCH_BASIN_LEAD (PolyLineZ=13) exercise this).
_BASE_TYPE = {
    SHAPE_POINT: SHAPE_POINT, 11: SHAPE_POINT, 21: SHAPE_POINT,
    SHAPE_POLYLINE: SHAPE_POLYLINE, 13: SHAPE_POLYLINE, 23: SHAPE_POLYLINE,
    SHAPE_POLYGON: SHAPE_POLYGON, 15: SHAPE_POLYGON, 25: SHAPE_POLYGON,
    SHAPE_MULTIPOINT: SHAPE_MULTIPOINT, 18: SHAPE_MULTIPOINT,
    28: SHAPE_MULTIPOINT,
}


def _ring_area2(ring):
    """Signed double area; >0 = CCW."""
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a


def parse_shp(data: bytes) -> list[dict | None]:
    """.shp bytes -> list of GeoJSON geometries (None for null
    shapes), one per record."""
    geoms = []
    n = len(data)
    pos = 100  # past header
    while pos + 8 <= n:
        (_recno, clen) = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        content = data[pos : pos + clen * 2]
        pos += clen * 2
        if len(content) < 4:
            break
        (stype_raw,) = struct.unpack("<i", content[:4])
        stype = _BASE_TYPE.get(stype_raw)
        if stype_raw == SHAPE_NULL or stype is None:
            geoms.append(None)
        elif stype == SHAPE_POINT:
            x, y = struct.unpack("<2d", content[4:20])
            geoms.append({"type": "Point", "coordinates": [x, y]})
        elif stype == SHAPE_MULTIPOINT:
            (npts,) = struct.unpack("<i", content[36:40])
            pts = struct.unpack(f"<{2 * npts}d", content[40 : 40 + 16 * npts])
            coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(npts)]
            geoms.append({"type": "MultiPoint", "coordinates": coords})
        elif stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
            nparts, npts = struct.unpack("<2i", content[36:44])
            parts = struct.unpack(f"<{nparts}i", content[44 : 44 + 4 * nparts])
            off = 44 + 4 * nparts
            pts = struct.unpack(f"<{2 * npts}d", content[off : off + 16 * npts])
            rings = []
            for p in range(nparts):
                a = parts[p]
                b = parts[p + 1] if p + 1 < nparts else npts
                rings.append([[pts[2 * i], pts[2 * i + 1]] for i in range(a, b)])
            if stype == SHAPE_POLYLINE:
                if len(rings) == 1:
                    geoms.append({"type": "LineString", "coordinates": rings[0]})
                else:
                    geoms.append({"type": "MultiLineString", "coordinates": rings})
            else:
                # group rings: CW (negative signed area) = outer ring,
                # CCW = hole of the preceding outer (shapefile spec;
                # matches the reference's upstream shp lib)
                polys = []
                for ring in rings:
                    if _ring_area2(ring) <= 0 or not polys:
                        polys.append([ring])
                    else:
                        polys[-1].append(ring)
                if len(polys) == 1:
                    geoms.append({"type": "Polygon", "coordinates": polys[0]})
                else:
                    geoms.append({"type": "MultiPolygon", "coordinates": polys})
        else:
            geoms.append(None)  # unsupported shape type -> skip row
    return geoms


def dbf_layout(header: bytes) -> tuple[list[tuple], int, int, int]:
    """DBF header bytes -> (fields, header_size, record_size,
    n_records). Exposed separately so the record-range fan-out path
    (shpsplit.py) can random-access fixed-size records per task."""
    n_records = struct.unpack("<I", header[4:8])[0]
    header_size = struct.unpack("<H", header[8:10])[0]
    record_size = struct.unpack("<H", header[10:12])[0]
    fields = []
    pos = 32
    while pos < header_size - 1 and header[pos] != 0x0D:
        desc = header[pos : pos + 32]
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(desc[11])
        length = desc[16]
        fields.append((name, ftype, length))
        pos += 32
    return fields, header_size, record_size, n_records


def dbf_record(rec: bytes, fields: list[tuple]) -> list[tuple] | None:
    """One fixed-size DBF record -> ordered [(name, value, ctype)...],
    or None for a deleted (b'*') record."""
    if not rec or rec[0:1] == b"*":
        return None
    out = []
    off = 1
    for name, ftype, length in fields:
        # the reference reads DBF text as UTF-8 (shapefile.js:227
        # `shapefile.reader(shp, 'utf-8')`; smoke municipios.zip
        # carries UTF-8 accents) with U+FFFD replacement
        raw = rec[off : off + length].decode("utf-8", "replace")
        off += length
        s = raw.strip().strip("\x00")  # NUL-padded text (soql/text.js:13)
        if ftype in ("N", "F"):
            if s == "":
                out.append((name, None, "null"))
            else:
                try:
                    out.append((name, float(s), "number"))
                except ValueError:
                    out.append((name, None, "null"))
        elif ftype == "L":
            if s in ("T", "t", "Y", "y"):
                out.append((name, True, "boolean"))
            elif s in ("F", "f", "N", "n"):
                out.append((name, False, "boolean"))
            else:
                out.append((name, None, "null"))
        elif ftype == "D" and len(s) == 8:
            out.append((name, f"{s[0:4]}-{s[4:6]}-{s[6:8]}T00:00:00.000Z", "string"))
        else:
            out.append((name, s, "string"))
    return out


def parse_dbf(data: bytes) -> list[list[tuple] | None]:
    """.dbf bytes -> per-record ordered [(name, value, ctype), ...].

    Deleted records (b'*' flag) yield None PLACEHOLDERS, never gaps:
    .shp records are positional, so dropping a deleted DBF row would
    shift every subsequent record's attributes onto the wrong geometry
    (silent corruption). Callers skip the (geom, None) pair."""
    fields, header_size, record_size, n_records = dbf_layout(data)
    out = []
    pos = header_size
    for _ in range(n_records):
        rec = data[pos : pos + record_size]
        pos += record_size
        out.append(dbf_record(rec, fields))
    return out


def parse_prj(wkt: str) -> str:
    """WKT -> CRS tag the projection module understands. Geographic
    WGS84 WKT -> identity; otherwise pass the WKT through —
    projection.parse_crs parses PROJCS/GEOGCS WKT generically
    (lcc/tmerc/webmerc + SPHEROID + linear UNIT + datum shift), and
    callers with genuinely unsupported CRSs get a reproject error row
    (operators/reproject.py), matching the reference's surfacing of
    srs parse failures."""
    w = wkt.strip()
    if w.startswith("GEOGCS") and ("WGS_1984" in w or "WGS 84" in w):
        return DEFAULT_PRJ
    return w


def _promote(geom: dict | None) -> dict | None:
    """shapefile.js:121-131: Polygon/LineString promoted to Multi*."""
    if geom is None:
        return None
    if geom["type"] == "Polygon":
        return {"type": "MultiPolygon", "coordinates": [geom["coordinates"]] if geom["coordinates"] else []}
    if geom["type"] == "LineString":
        return {"type": "MultiLineString", "coordinates": [geom["coordinates"]] if geom["coordinates"] else []}
    return geom


def parse_shapefile_zip(data: bytes) -> list[dict]:
    """Shapefile zip -> list of feature rows
    {geom, properties: [(name, value, ctype)...], crs}, triples
    processed sorted by basename."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    groups: dict[str, dict[str, str]] = {}
    for info in zf.infolist():
        if info.is_dir():
            continue
        # the reference walks only entries at most one directory deep
        # (shapefile.js:246 dirname-segment check) — this is what makes
        # __MACOSX/ resource forks and doubly-nested duplicate triples
        # (smoke wards-chicago.zip) invisible to the decoder
        if info.filename.count("/") > 1:
            continue
        base = info.filename.rsplit("/", 1)[-1]
        if base.startswith("."):
            continue
        stem, _, ext = base.rpartition(".")
        # extensions AND basenames match case-insensitively: the
        # reference lowercases extensions (shapefile.js:34-47) and its
        # sorted positional zip pairs dpw_x.shp with DPW_X.dbf (smoke
        # xdpw fixture ships exactly that case mix)
        key = info.filename[: len(info.filename) - len(ext) - 1].lower()
        groups.setdefault(key, {})[ext.lower()] = info.filename
    rows: list[dict] = []
    for key in sorted(groups):
        g = groups[key]
        if "shp" not in g and "dbf" not in g:
            continue  # stray file (e.g. .shx only)
        if "shp" not in g:
            raise ValueError(f"incomplete shapefile: missing .shp for {key}")
        if "dbf" not in g:
            raise ValueError(f"incomplete shapefile: missing .dbf for {key}")
        crs = DEFAULT_PRJ
        if "prj" in g:
            crs = parse_prj(zf.read(g["prj"]).decode("ascii", "replace"))
        geoms = parse_shp(zf.read(g["shp"]))
        attrs = parse_dbf(zf.read(g["dbf"]))
        for geom, props in zip(geoms, attrs):
            if geom is None:
                continue  # record without geometry skipped (P2)
            if props is None:
                continue  # deleted DBF record (alignment preserved above)
            rows.append({"geom": _promote(geom), "properties": props, "crs": crs})
    return rows


# --- Spark wrapper ----------------------------------------------------------

def make_shapefile_features_udf():
    """pandas UDF: base64 shapefile-zip -> array of parsed features
    (unified schema, union-compatible with geojson/kml sources)."""
    import base64

    from pyspark.sql.functions import pandas_udf

    from geo_import_spark.sources.kml import _features_udf_types

    def parse(texts):
        import pandas as pd

        from geo_import_spark.sources.kml import _row_to_feature

        out = []
        for t in texts:
            try:
                rows = parse_shapefile_zip(base64.b64decode(t))
                out.append(
                    [
                        _row_to_feature(
                            {"geom": r["geom"], "properties": r["properties"]},
                            crs=r["crs"],
                        )
                        for r in rows
                    ]
                )
            except Exception as e:
                out.append([(None, None, None, DEFAULT_PRJ, f"shapefile error: {e}")])
        return pd.Series(out)

    return pandas_udf(_features_udf_types())(parse)
