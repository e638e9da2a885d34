"""Record-range fan-out for ONE large shapefile entry (VERDICT r4 #2).

`parse_shapefile_zip` decodes a whole zip entry inside one pandas-UDF
call, so a multi-GB `.shp` parses on a single core while the rest of
the cluster idles. The reference has the same single-stream shape —
it reads records sequentially with backpressure
(es6-lib/decoders/layer.js:308-326). This module is the scale path:

1. INDEX — one cheap pass over the `.shp` record headers (8 bytes
   each; records are self-delimiting: big-endian record number +
   content length in 16-bit words, ESRI shapefile spec) builds a
   record-offset index without touching record payloads.
2. SPLIT — offsets coalesce into ~`target_bytes` byte ranges, one
   decode task per range.
3. DECODE — `mapInPandas` over the range table: each task seeks
   straight to its byte range inside the STORED zip entry (or bare
   `.shp`), parses only its records, and random-accesses exactly its
   own `.dbf` record window (DBF records are fixed-size, so attribute
   alignment — including deleted-record placeholders — is preserved
   across range boundaries).

DEFLATE-compressed entries are not seekable (the same physics that
makes gzip unsplittable in every engine); `shapefile_split_plan`
raises for them and callers keep the whole-entry single-task decode.
At 100-TB scale the storage layout answer is "store shapefiles
uncompressed (zip -0) or as bare .shp/.dbf objects", and the index
pass runs as one metadata task per file.

Output schema matches pass-1 parsed features (doc_id, span_offset,
geom, properties, props, crs, error) — union-compatible with the
GeoJSON/KML sources, so layer merge and reprojection run unchanged
downstream.
"""

from __future__ import annotations

import struct
import zipfile

from pyspark.sql import DataFrame, SparkSession

from geo_import_spark.sources import shapefile as shpmod

SHP_HEADER = 100  # main file header size, ESRI spec


def _stored_span(path: str, info: zipfile.ZipInfo) -> tuple[int, int]:
    """Absolute (data_offset, size) of a STORED zip entry — the local
    header must be re-read because its extra field may differ from the
    central directory's."""
    if info.compress_type != zipfile.ZIP_STORED:
        raise ValueError(
            f"zip entry {info.filename!r} is compressed "
            f"(type {info.compress_type}); byte-range decode needs a "
            "stored (zip -0) entry — fall back to parse_shapefile_zip"
        )
    with open(path, "rb") as f:
        f.seek(info.header_offset)
        hdr = f.read(30)
        if hdr[:4] != b"PK\x03\x04":
            raise ValueError(f"bad local header for {info.filename!r}")
        nlen, elen = struct.unpack("<HH", hdr[26:30])
        return info.header_offset + 30 + nlen + elen, info.file_size


def index_shp_ranges(
    path: str, shp_off: int, shp_size: int, target_bytes: int
) -> list[tuple[int, int, int, int]]:
    """Walk the .shp record headers once and coalesce records into
    [(byte_start, byte_end, rec_start, rec_count), ...] ranges of
    ~target_bytes (offsets relative to the entry start). Reads 8
    bytes per record — O(records) seeks, never record payloads."""
    ranges = []
    with open(path, "rb") as f:
        pos = SHP_HEADER
        rec = 0
        cur_pos, cur_rec = pos, 0
        while pos + 8 <= shp_size:
            f.seek(shp_off + pos)
            h = f.read(8)
            if len(h) < 8:
                break
            (_recno, clen) = struct.unpack(">ii", h)
            pos += 8 + 2 * clen
            rec += 1
            if pos - cur_pos >= target_bytes:
                ranges.append((cur_pos, pos, cur_rec, rec - cur_rec))
                cur_pos, cur_rec = pos, rec
        if rec > cur_rec:
            ranges.append((cur_pos, pos, cur_rec, rec - cur_rec))
    return ranges


def shapefile_split_plan(path: str, target_bytes: int = 64 << 20) -> list[dict]:
    """Driver-side metadata pass: triple grouping identical to
    parse_shapefile_zip (one-dir-deep, case-insensitive, sorted), then
    one plan row per byte range. Only entry headers and the .shp
    record headers are read — never payloads."""
    zf = zipfile.ZipFile(path)
    groups: dict[str, dict[str, str]] = {}
    for info in zf.infolist():
        if info.is_dir() or info.filename.count("/") > 1:
            continue
        base = info.filename.rsplit("/", 1)[-1]
        if base.startswith("."):
            continue
        stem, _, ext = base.rpartition(".")
        key = info.filename[: len(info.filename) - len(ext) - 1].lower()
        groups.setdefault(key, {})[ext.lower()] = info.filename
    plan: list[dict] = []
    for key in sorted(groups):
        g = groups[key]
        if "shp" not in g and "dbf" not in g:
            continue
        if "shp" not in g:
            raise ValueError(f"incomplete shapefile: missing .shp for {key}")
        if "dbf" not in g:
            raise ValueError(f"incomplete shapefile: missing .dbf for {key}")
        crs = shpmod.DEFAULT_PRJ
        if "prj" in g:
            crs = shpmod.parse_prj(zf.read(g["prj"]).decode("ascii", "replace"))
        shp_off, shp_size = _stored_span(path, zf.getinfo(g["shp"]))
        dbf_off, _dbf_size = _stored_span(path, zf.getinfo(g["dbf"]))
        # the DBF header (layout + field descriptors) is tiny; read it
        # once here so tasks can seek straight to their record window
        with open(path, "rb") as f:
            f.seek(dbf_off)
            head = f.read(32)
            header_size = struct.unpack("<H", head[8:10])[0]
            f.seek(dbf_off)
            dbf_header = f.read(header_size)
        _fields, header_size, record_size, _n = shpmod.dbf_layout(dbf_header)
        stem = key.rsplit("/", 1)[-1]
        for byte_start, byte_end, rec_start, rec_count in index_shp_ranges(
            path, shp_off, shp_size, target_bytes
        ):
            plan.append(
                {
                    "path": path,
                    "stem": stem,
                    "crs": crs,
                    "shp_off": shp_off,
                    "byte_start": byte_start,
                    "byte_end": byte_end,
                    "rec_start": rec_start,
                    "rec_count": rec_count,
                    "dbf_off": dbf_off,
                    "dbf_header_size": header_size,
                    "dbf_record_size": record_size,
                }
            )
    return plan


_PLAN_SCHEMA = (
    "path string, stem string, crs string, shp_off long, byte_start long, "
    "byte_end long, rec_start long, rec_count long, dbf_off long, "
    "dbf_header_size long, dbf_record_size long"
)

_OUT_SCHEMA = (
    "doc_id string, span_offset long, "
    "geom struct<gtype:string,part_offsets:array<int>,"
    "ring_offsets:array<int>,xs:array<double>,ys:array<double>>, "
    "properties string, props array<struct<name:string,value:string,"
    "ctype:string>>, crs string, error string"
)


def _decode_ranges(batches):
    import pandas as pd

    from geo_import_spark.sources.kml import _row_to_feature

    for pdf in batches:
        for row in pdf.itertuples(index=False):
            with open(row.path, "rb") as f:
                f.seek(row.shp_off + row.byte_start)
                blob = f.read(row.byte_end - row.byte_start)
                f.seek(row.dbf_off)
                dbf_header = f.read(row.dbf_header_size)
                fields, _hs, rs, _n = shpmod.dbf_layout(dbf_header)
                f.seek(row.dbf_off + row.dbf_header_size + row.rec_start * rs)
                recs = f.read(row.rec_count * rs)
            # prepend a blank main header so the record-stream parser's
            # offset arithmetic applies unchanged
            geoms = shpmod.parse_shp(b"\x00" * SHP_HEADER + blob)
            out = []
            for i, geom in enumerate(geoms[: row.rec_count]):
                props = shpmod.dbf_record(recs[i * rs : (i + 1) * rs], fields)
                if geom is None or props is None:
                    continue  # P2 geometry-presence / deleted DBF row
                g, pj, pr, crs, err = _row_to_feature(
                    {"geom": shpmod._promote(geom), "properties": props},
                    crs=row.crs,
                )
                out.append(
                    {
                        "doc_id": row.stem,
                        "span_offset": row.rec_start + i,
                        "geom": None
                        if g is None
                        else {
                            "gtype": g[0],
                            "part_offsets": g[1],
                            "ring_offsets": g[2],
                            "xs": g[3],
                            "ys": g[4],
                        },
                        "properties": pj,
                        "props": [
                            {"name": a, "value": b, "ctype": c} for a, b, c in pr
                        ],
                        "crs": crs,
                        "error": err,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "span_offset", "geom", "properties",
                    "props", "crs", "error",
                ],
            )


def ranged_shapefile_features(
    spark: SparkSession, path: str, target_bytes: int = 64 << 20
) -> DataFrame:
    """Parallel decode of a (stored) shapefile zip: one task per
    ~target_bytes of .shp records, output union-compatible with the
    pass-1 parsed-feature frames. Row-for-row identical to
    parse_shapefile_zip on the same archive (asserted in
    tests/test_shpsplit.py)."""
    plan = shapefile_split_plan(path, target_bytes)
    if not plan:
        raise ValueError(f"no shapefile triples in {path!r}")
    pdf = spark.createDataFrame(plan, _PLAN_SCHEMA).repartition(len(plan))
    return pdf.mapInPandas(_decode_ranges, _OUT_SCHEMA)
