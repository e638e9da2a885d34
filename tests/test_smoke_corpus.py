"""Smoke-corpus goldens — the reference's second test tier (real
municipal datasets with pinned row counts / columns / bboxes) replayed
through the engine decoders (VERDICT r3 missing #2).

Sources of truth (assertions transcribed, fixtures used as INPUT only):
- es6-test/smoke/decoders.js:100-353  (row counts, municipio names,
  KML/KMZ column sets, NaN guard)
- es6-test/smoke/flow-control.js:56-150 (wards.* = 53 rows in every
  format; the flow-control mechanics themselves are Node-stream
  concerns with no Spark analogue — the portable golden is the count)
- es6-test/smoke/merger.js:28-146   (arity handling, CATCH_BASIN bbox
  + column goldens, co-parcels the_geom/invalid_the_geom)
- es6-test/smoke/shp-http.js:70-93  (wards-chicago garbage-tolerant
  1-layer quick summary)

These fixtures are messy on purpose: mixed-case triple names
(xdpw), PolygonM/PolyLineZ shape types (xNeighbourhood /
CATCH_BASIN), undeclared XML namespace prefixes (terrassa), UTF-8
DBF text (municipios), __MACOSX garbage + doubly-nested duplicate
triples (wards-chicago).
"""

import base64
import json
import math

import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import layers as layersmod
from geo_import_spark.services import summary as svc
from geo_import_spark.soql import naming
from geo_import_spark.sources import dispatch
from geo_import_spark.sources import kml as kmlmod
from geo_import_spark.sources import shapefile as shpmod
from geo_import_spark.sources.geojson import DEFAULT_CRS, _parse_one

SMOKE = "/root/reference/es6-test/fixtures/smoke"
SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _read(name: str) -> bytes:
    with open(f"{SMOKE}/{name}", "rb") as f:
        return f.read()


def _blob_docs(spark, name: str, fmt: str):
    """One document whose geometry span(s) carry the fixture blob in
    the engine's span encoding (geojson: one span per feature; kmz /
    shapefile: base64; kml: text)."""
    data = _read(name)
    if fmt == "geojson":
        fc = json.loads(data)
        spans = [
            ("geometry", json.dumps(f), "", i)
            for i, f in enumerate(fc["features"])
        ]
    elif fmt in ("kmz", "shapefile"):
        spans = [("geometry", base64.b64encode(data).decode(), "", 0)]
    else:
        spans = [("geometry", data.decode("utf-8", "replace"), "", 0)]
    docs = spark.createDataFrame([("doc-0", spans)], SPANS_SCHEMA)
    return docs.withColumn("format", F.lit(fmt))


# --- shapefile decoder: pinned row counts (decoders.js:100-143) -------------

@pytest.mark.parametrize(
    "fixture,expected",
    [
        ("xdpw_supervisorial_districts_2011.zip", 5),  # decoders.js:111
        ("xLibrTaxDist.zip", 116),                     # decoders.js:126
        ("xNeighbourhood.zip", 236),                   # decoders.js:140 (PolygonM)
        ("wards.zip", 53),                             # flow-control.js:148
    ],
)
def test_smoke_shapefile_row_counts(fixture, expected):
    rows = shpmod.parse_shapefile_zip(_read(fixture))
    assert len(rows) == expected


def test_smoke_municipios_names():
    """decoders.js:149-240: all 78 Puerto Rico municipios decode with
    their UTF-8 accents intact."""
    rows = shpmod.parse_shapefile_zip(_read("municipios.zip"))
    names = sorted(
        v for r in rows for (n, v, _t) in r["properties"]
        if n.lower() == "municipio"
    )
    assert len(names) == 78
    assert names[0] == "Adjuntas" and names[-1] == "Yauco"
    for accented in ("Añasco", "Bayamón", "Mayagüez", "Peñuelas",
                     "Río Grande", "San Sebastián", "Loíza"):
        assert accented in names


# --- KML / KMZ decoders (decoders.js:243-353) --------------------------------

def test_smoke_noaa_kml_columns():
    """decoders.js:293-311 'kml nulls': every row's attribute columns
    are exactly {name, descriptio} (plus the geometry)."""
    rows = kmlmod.parse_kml_document(_read("noaa.kml"))
    assert len(rows) == 227
    for r in rows:
        assert sorted(n for n, _v, _t in r["properties"]) == [
            "descriptio", "name",
        ]


def test_smoke_terrassa_kml_columns():
    """decoders.js:337-352: terrassa.kml (undeclared xsi: prefix —
    the lenient-retry path) decodes with {name, description} per row."""
    rows = kmlmod.parse_kml_document(_read("terrassa.kml"))
    assert len(rows) > 0
    for r in rows:
        assert sorted(n for n, _v, _t in r["properties"]) == [
            "description", "name",
        ]


def test_smoke_police_beats_kmz_columns():
    """decoders.js:313-335: nested-KML KMZ; every row's laundered
    column set matches the 10-name golden."""
    expected = sorted([
        "the_geom", "objectid", "area", "perimeter", "patternc",
        "patternc_i", "districtc", "square_mil", "shape_leng",
        "shape_area",
    ])
    rows = kmlmod.parse_kmz(_read("police_beats_patternc.kmz"))
    assert len(rows) > 0
    for r in rows:
        laundered = ["the_geom"] + [
            naming.launder(naming.rename_attribute(n))
            for n, _v, _t in r["properties"]
        ]
        assert sorted(laundered) == expected


def test_smoke_boundaries_kml_finite_coordinates():
    """decoders.js:276-291 'many many chunks of kml should end up with
    numbers': no NaN/inf coordinate anywhere."""
    rows = kmlmod.parse_kml_document(_read("boundaries.kml"))
    assert len(rows) > 0
    bad = 0

    def walk(c):
        nonlocal bad
        if isinstance(c, (int, float)):
            if not math.isfinite(c):
                bad += 1
        else:
            for x in c:
                walk(x)

    for r in rows:
        if r["geom"] and r["geom"]["coordinates"] is not None:
            walk(r["geom"]["coordinates"])
    assert bad == 0


# --- merger tier (merger.js) -------------------------------------------------

def test_smoke_private_public_empty_point():
    """merger.js:28-56 feeds a Point with empty coordinates. Engine
    semantics (P4/P5, unit-tier parity): the empty geometry NULLIFIES
    instead of erroring — the reference smoke tier instead raises
    invalid-arity-error when the layer is read back; its own unit tier
    nullifies, and the engine follows the unit tier. Pin: the feature
    parses with a null geometry and no error."""
    fc = json.loads(_read("private_public.geojson"))
    empty = [
        f for f in fc["features"]
        if f.get("geometry", {}).get("coordinates") == []
    ]
    assert len(empty) == 1
    geom, _pj, _props, _crs, err = _parse_one(json.dumps(empty[0]), DEFAULT_CRS)
    assert geom is None and err is None


def test_smoke_catch_basin_layer(spark):
    """merger.js:58-146 'mostly null shp': PolyLineZ promotes to
    multiline; bbox approx golden (the .prj is geographic WGS84 so no
    reprojection moves it); column fieldName/dataTypeName goldens."""
    docs = _blob_docs(spark, "CATCH_BASIN_LEAD_POLY.zip", "shapefile")
    parsed = dispatch.decode_geometry_spans(docs)
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    s = layersmod.layer_summary(assigned, layers)[0]
    assert s["bbox"]["minx"] == pytest.approx(-113.71250, abs=1e-4)
    assert s["bbox"]["miny"] == pytest.approx(53.39732, abs=1e-4)
    assert s["bbox"]["maxx"] == pytest.approx(-113.29525, abs=1e-4)
    assert s["bbox"]["maxy"] == pytest.approx(53.65448, abs=1e-4)
    assert [(c["fieldName"], c["dataTypeName"]) for c in s["columns"]] == [
        ("the_geom", "multiline"),
        ("facility", "text"),
        ("type", "text"),
        ("year_const", "number"),
        ("nghbrhd", "text"),
        ("nghbrhd_id", "text"),
        ("ward", "text"),
        ("str_ave", "text"),
    ]


def test_smoke_co_parcels_geom_column_collision(spark):
    """merger.js:118-145: the DBF carries an attribute literally named
    'the_geom'; it renames to invalid_the_geom (text) and the real
    geometry keeps the_geom (multipolygon)."""
    docs = _blob_docs(spark, "co-parcels.zip", "shapefile")
    parsed = dispatch.decode_geometry_spans(docs)
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    s = layersmod.layer_summary(assigned, layers)[0]
    by_field = {c["fieldName"]: c["dataTypeName"] for c in s["columns"]}
    assert by_field["the_geom"] == "multipolygon"
    assert by_field["invalid_the_geom"] == "text"


# --- cross-format consistency (flow-control.js:56-150) -----------------------

@pytest.mark.parametrize(
    "fixture,fmt",
    [
        ("wards.geojson", "geojson"),
        ("wards.kml", "kml"),
        ("wards.kmz", "kmz"),
        ("wards.zip", "shapefile"),
    ],
)
def test_smoke_wards_53_rows_every_format(spark, fixture, fmt):
    """The same Chicago wards dataset in four formats decodes to 53
    features through the full span->decode->merge path. (53 is the
    DECODER row count the reference asserts; a handful of features
    omit attributes, so the merger legitimately splits them into
    sparse side layers in kml/geojson form.)"""
    docs = _blob_docs(spark, fixture, fmt)
    parsed = dispatch.decode_geometry_spans(docs)
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) >= 1
    n = assigned.filter(F.col("error").isNull()).count()
    assert n == 53


# --- summary service (shp-http.js:70-93) -------------------------------------

def test_smoke_wards_chicago_garbage_tolerant_summary():
    """wards-chicago.zip ships __MACOSX resource forks, a nested
    duplicate triple two directories deep, a stray geojson and a
    nested zip — the quick summary sees exactly ONE layer."""
    s = svc.quick_shapefile_summary(_read("wards-chicago.zip"))
    assert len(s) == 1
    assert s[0]["name"] == "wards_chicago_mid_simp"
    assert s[0]["count"] == 0 and s[0]["columns"] == []
