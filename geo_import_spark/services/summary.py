"""Summary service — full / quick / abbreviated modes, mirroring the
reference's SummaryService dispatch (es6-lib/services/summary.js:10-93):

- shapefile blobs ALWAYS summarize quickly (canSummarizeQuickly() is
  true for the shapefile decoder only): read ONLY the .prj zip
  entries, never .shp/.dbf record data
  (es6-lib/decoders/shapefile.js:293-320).
- other formats: full streaming summary when the blob is smaller than
  abbreviateSummarySize (10 GB, es6-lib/config/config.js:7), else the
  abbreviated [] (base decoders have no summarize()).
- full mode is the reference's throwaway Merger (no scratch writes) —
  in Spark an aggregate-only plan never materializes rows, so the
  equivalent falls out of the layer_summary aggregate for free.

Plus the at-scale variant the reference cannot do: table_summary()
answers count/bbox/schema questions from the Iceberg-style manifest
ALONE — zero Spark jobs, zero data-file reads (the Iceberg
scan-planning equivalent of the metadata-only quick path).
"""

from __future__ import annotations

import io
import re
import zipfile

ABBREVIATE_SUMMARY_SIZE = 10 * 1024**3  # es6-lib/config/config.js:7

EMPTY_BBOX = {"minx": None, "miny": None, "maxx": None, "maxy": None}


def _wkt_name(prj_text: str) -> str:
    """Projection display name: first quoted name of the WKT root
    node (what srs.parse(projection).name yields for the fixtures),
    else the raw text (proj4 strings pass through)."""
    m = re.match(r'\s*[A-Z_]+\[\s*"([^"]+)"', prj_text)
    return m.group(1) if m else prj_text.strip()


def quick_shapefile_summary(blob: bytes) -> list[dict]:
    """Prj-only shapefile summary (shapefile.js:293-320): one layer
    stub per .prj entry — projection name + layer name, count 0,
    empty bbox, no columns. READS NO DATA: only *.prj entries are
    ever opened, so a multi-GB .shp costs nothing."""
    out = []
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            # entries >1 directory deep are invisible (shapefile.js:246
            # _walk depth check) — smoke wards-chicago.zip carries a
            # doubly-nested duplicate .prj that must NOT become a layer
            if info.filename.count("/") > 1:
                continue
            base = info.filename.rsplit("/", 1)[-1]
            if base.startswith(".") or not base.lower().endswith(".prj"):
                continue
            prj = zf.read(info).decode("utf-8", "replace")
            out.append(
                {
                    "count": 0,
                    "projection": _wkt_name(prj),
                    "name": base[: -len(".prj")],
                    "geometry": None,
                    "bbox": dict(EMPTY_BBOX),
                    "columns": [],
                }
            )
    return out


def abbreviated_summary() -> list[dict]:
    """Size-gated fallback for formats without a quick path
    (summary.js:11-17): no layers reported."""
    return []


def full_summary(spark, documents, fmt: str, specs: list | None = None) -> list[dict]:
    """Full-stream summary: decode every geometry span, merge layers,
    aggregate count/bbox/geomType/columns per layer. Aggregate-only
    plan — Spark never materializes the rows anywhere (the reference's
    throwaway Merger, merger.js ctor arg / layer.js:249-252). `specs`
    is the caller's per-position layer spec list (merger.js:72 — names
    land in each summary entry's `name`)."""
    from pyspark.sql import functions as F

    from geo_import_spark.operators import layers as layersmod
    from geo_import_spark.sources import dispatch

    docs = documents.withColumn("format", F.lit(fmt))
    parsed = dispatch.decode_geometry_spans(docs)
    assigned, layers = layersmod.merge_layers(parsed, specs=specs)
    return layersmod.layer_summary(assigned, layers)


def summarize_blob(
    spark, blob: bytes, fmt: str, size: int | None = None,
    specs: list | None = None,
) -> list[dict]:
    """The SummaryService.post dispatch (summary.js:63-90):
    shapefile -> quick prj-only; small declared size -> full; else
    abbreviated. `size` is the caller's X-Blob-Length equivalent: the
    reference trusts the header, and when it is MISSING it warns and
    abbreviates — so size=None returns the abbreviated [] here too."""
    if fmt == "shapefile":
        return quick_shapefile_summary(blob)
    if size is None or size >= ABBREVIATE_SUMMARY_SIZE:
        return abbreviated_summary()
    import json

    # Fan the blob out BEFORE the parse UDF (VERDICT r3 #9): one
    # document per independent parse unit (GeoJSON feature / KMZ zip
    # entry), so a multi-entry archive parallelizes across tasks
    # instead of sitting on one core. A monolithic KML stays one unit —
    # a single XML document has no safe split point.
    if fmt == "geojson":
        # A GeoJSON blob is a FeatureCollection; one geometry span per
        # feature (the decoder's features.* stream). A collection-level
        # CRS is the per-feature default (merger.js:22).
        obj = json.loads(blob)
        feats = obj.get("features", [obj]) if isinstance(obj, dict) else []
        fc_crs = obj.get("crs") if isinstance(obj, dict) else None
        units = []
        for f in feats:
            if fc_crs is not None and isinstance(f, dict) and "crs" not in f:
                f = {**f, "crs": fc_crs}
            units.append(json.dumps(f))
    elif fmt == "kmz":  # shapefile never reaches here (quick path above)
        # split per .kml entry (zip order — kmz.js:18-134 concatenates
        # entries, and entry order == doc_id order here) and hand each
        # to the plain-KML decoder as its own unit
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            units = [
                zf.read(info).decode("utf-8", "replace")
                for info in zf.infolist()
                if info.filename.lower().endswith(".kml") and not info.is_dir()
            ]
        fmt = "kml"
    else:  # kml text
        units = [blob.decode("utf-8", "replace")]
    docs = spark.createDataFrame(
        [(f"blob-{i:06d}", [("geometry", u, "", 0)]) for i, u in enumerate(units)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    return full_summary(spark, docs, fmt, specs=specs)


def table_summary(table) -> dict:
    """Metadata-only summary of an Iceberg-style table: row count,
    file count, schema, committed properties (e.g. the mega-bbox) and
    min/max column stats folded across the manifest's per-file stats.
    Zero Spark jobs, zero data reads — by construction (no
    SparkSession is even accepted)."""
    snap = table.current_snapshot()
    if snap is None:
        return {"rows": 0, "files": 0, "schema": None, "properties": {}, "stats": {}}
    stats: dict = {}
    for f in snap["files"]:
        for k, v in (f.get("stats") or {}).items():
            if v is None:
                continue
            if k.startswith("min_"):
                stats[k] = v if k not in stats else min(stats[k], v)
            elif k.startswith("max_"):
                stats[k] = v if k not in stats else max(stats[k], v)
    return {
        "rows": snap["rows"],
        "files": len(snap["files"]),
        "schema": snap["schema"],
        "properties": snap.get("properties", {}),
        "stats": stats,
    }
