"""Layer-normalization parity: the reference's unit/merger.js,
unit/kml.js, unit/kmz.js and unit/geometry-transforms.js goldens
replayed through the Spark engine over the reference fixture corpus
(/root/reference/es6-test/fixtures, used as test INPUT only)."""

import json

import pytest
from pyspark.sql import functions as F

from geo_import_spark.functions import geomkern
from geo_import_spark.operators import layers as layersmod
from geo_import_spark.operators import reproject as reprojmod
from geo_import_spark.soql import naming
from geo_import_spark.sources import kml as kmlmod
from geo_import_spark.sources.geojson import DEFAULT_CRS, _parse_one

FIX = "/root/reference/es6-test/fixtures"
FLOAT_DELTA = 1e-9  # es6-test/unit/merger.js:53


def _features_df(spark, fixture: str):
    """FeatureCollection fixture -> parsed features DataFrame (the
    decoder+transform stage, driven through the same _parse_one the
    pandas UDF uses)."""
    with open(f"{FIX}/{fixture}") as f:
        fc = json.load(f)
    default = DEFAULT_CRS
    if isinstance(fc.get("crs"), dict):
        default = fc["crs"]["properties"]["name"]
    rows = []
    for i, feat in enumerate(fc["features"]):
        geom, props_json, props, crs, err = _parse_one(json.dumps(feat), default)
        rows.append(
            (f"doc-{i}", i, geom, props_json, props, crs, err)
        )
    from geo_import_spark.sources.geojson import GEOM_TYPE, PROPS_TYPE
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("span_offset", T.IntegerType()),
            T.StructField("geom", GEOM_TYPE),
            T.StructField("properties", T.StringType()),
            T.StructField("props", PROPS_TYPE),
            T.StructField("crs", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _schema_of(layer):
    names = layer.out_names
    return [(names[0], layer.geom_ctype)] + [
        (n, t) for n, (_, t) in zip(names[1:], layer.columns)
    ]


EXPECTED_POINTS_SCHEMA = [
    ("the_geom", "point"),
    ("a_string", "string"),
    ("a_num", "number"),
    ("a_float", "number"),
    ("a_bool", "boolean"),
]


def test_simple_points_single_layer(spark):
    """merger.js:57-107 golden."""
    parsed = _features_df(spark, "simple_points.json")
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    assert _schema_of(layers[0]) == EXPECTED_POINTS_SCHEMA
    out = layersmod.normalize_layer(assigned, layers[0]).orderBy("span_offset")
    rows = out.collect()
    assert [r["a_string"] for r in rows] == ["first value", "second value"]
    assert [r["a_num"] for r in rows] == [2.0, 2.0]
    assert [r["a_float"] for r in rows] == [2.2, 2.2]
    assert [r["a_bool"] for r in rows] == [False, True]
    assert rows[0]["the_geom"]["xs"] == [102.0] and rows[0]["the_geom"]["ys"] == [0.5]


def test_multi_crs_split_and_reproject(spark):
    """merger.js:149-184: 2 layers split by CRS; EPSG:26915 row
    reprojected to the pinned proj4 output."""
    parsed = _features_df(spark, "multi_crs.json")
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 2
    for layer in layers:
        assert _schema_of(layer) == EXPECTED_POINTS_SCHEMA
    rep = reprojmod.reproject_layers(assigned)
    by_layer = {
        r["layer_idx"]: (r["geom"]["xs"][0], r["geom"]["ys"][0])
        for r in rep.collect()
    }
    # layer order = first occurrence: feature 0 is EPSG:26915
    x, y = by_layer[0]
    assert x == pytest.approx(-97.48783007891072, abs=FLOAT_DELTA)
    assert y == pytest.approx(0.00000450969282, abs=FLOAT_DELTA)
    x, y = by_layer[1]
    assert x == pytest.approx(103.0, abs=FLOAT_DELTA)
    assert y == pytest.approx(1.5, abs=FLOAT_DELTA)


def test_multi_non_wgs84(spark):
    """merger.js:110-146: EPSG:26915 + EPSG:23700 (somerc + datum
    shift), both reprojected."""
    parsed = _features_df(spark, "multi_non_wgs84.json")
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 2
    rep = reprojmod.reproject_layers(assigned)
    by_layer = {
        r["layer_idx"]: (r["geom"]["xs"][0], r["geom"]["ys"][0])
        for r in rep.collect()
    }
    assert by_layer[0][0] == pytest.approx(-97.48783007892, abs=FLOAT_DELTA)
    assert by_layer[0][1] == pytest.approx(0.00000450965, abs=FLOAT_DELTA)
    assert by_layer[1][0] == pytest.approx(10.7889673904, abs=FLOAT_DELTA)
    assert by_layer[1][1] == pytest.approx(45.0359670320, abs=FLOAT_DELTA)


def test_points_and_lines_two_layers(spark):
    """Mixed geometry types split into 2 layers (merger.js:50-64
    schema identity includes the geometry ctype)."""
    parsed = _features_df(spark, "points_and_lines.json")
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 2
    assert sorted(l.geom_ctype for l in layers) == ["linestring", "point"]


def test_dup_columns_renamed(spark):
    """merger.js:464-480: post-laundering collisions -> _1, _2, _3."""
    parsed = _features_df(spark, "simple_points_dup_columns.json")
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    names = layers[0].out_names
    assert names == ["the_geom", "a_string", "a_string_1", "a_string_2", "a_string_3"]


def test_empty_coords_nullified_and_refined(spark):
    """empty_coords.json: LineString with [] coords -> null geometry
    for that row; layer still types the_geom from the other rows
    (soql/mapper.js:32-46 + layer.js:214-236)."""
    parsed = _features_df(spark, "empty_coords.json")
    # P5 nullification happens IN the parser now — no test-side fixup
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    assert layers[0].geom_ctype == "linestring"
    out = layersmod.normalize_layer(assigned, layers[0])
    assert out.filter(F.col("the_geom").isNull()).count() >= 1


def test_vertex_guard_on_kml_and_shapefile_path(monkeypatch):
    """G6 on the non-GeoJSON decoder paths: an over-limit geometry
    routed through _row_to_feature (KML/KMZ/shapefile share it)
    becomes an error row, not a layer row (layer.js:254-258 /
    merger.js:418-432 vertex-limit golden, limit scaled down)."""
    monkeypatch.setattr(geomkern, "MAX_VERTICES_PER_ROW", 5)
    big_line = {"type": "LineString",
                "coordinates": [[float(i), float(i)] for i in range(10)]}
    row = {"geom": big_line, "properties": [("name", "big", "string")]}
    geom, pj, props, crs, err = kmlmod._row_to_feature(row)
    assert geom is None and err == "too many vertices"
    small = {"geom": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": []}
    geom, _, _, _, err = kmlmod._row_to_feature(small)
    assert err is None and geom[0] == "Point"


def test_empty_coords_nullified_on_kml_path():
    """P5 on the shared _row_to_feature path: empty coordinate list ->
    null geometry, no error."""
    row = {"geom": {"type": "LineString", "coordinates": []}, "properties": []}
    geom, pj, props, crs, err = kmlmod._row_to_feature(row)
    assert geom is None and err is None


def test_arity_error_side_channel(spark):
    """merger.js:433-462: invalid arity -> error row, not a crash."""
    parsed = _features_df(spark, "simple_points_invalid_arity.json")
    errs = parsed.filter(F.col("error").isNotNull()).collect()
    assert len(errs) == 1
    assert "arity" in errs[0]["error"]
    _, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1  # the good rows still form their layer


def test_linify_and_close_rings():
    """unit/geometry-transforms.js:10-60 goldens, kernel level."""
    # 1-point LineString -> duplicated point
    gt, po, ro, xs, ys = geomkern.fix_semantics(
        "LineString", [0, 1], [0, 1], [102.0], [0.5]
    )
    assert xs == [102.0, 102.0] and ys == [0.5, 0.5]
    # open ring -> first vertex appended
    gt, po, ro, xs, ys = geomkern.fix_semantics(
        "Polygon", [0, 1], [0, 3], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]
    )
    assert len(xs) == 4 and xs[-1] == 0.0 and ys[-1] == 0.0


def test_kml_type_guessing_golden():
    """unit/kml.js:40-54: '1 - 2' string, '42' number, '42.42' number."""
    rows = kmlmod.parse_kml_document(open(f"{FIX}/type_guessing.kml", "rb").read())
    assert len(rows) == 1
    assert rows[0]["properties"] == [
        ("a_string", "1 - 2", "string"),
        ("a_num", 42.0, "number"),
        ("a_float", 42.42, "number"),
    ]


def test_kml_with_nulls_golden():
    """unit/kml.js:23-38: empty values -> SoQLNull."""
    rows = kmlmod.parse_kml_document(open(f"{FIX}/with_nulls.kml", "rb").read())
    assert all(t == "null" and v is None for _, v, t in rows[0]["properties"])


def test_kml_untyped_booleans_stay_text():
    """unit/kml.js:56-107: 'false'/'true' NOT guessed as boolean."""
    rows = kmlmod.parse_kml_document(
        open(f"{FIX}/untyped_simple_points.kml", "rb").read()
    )
    types = {n: t for n, _, t in rows[0]["properties"]}
    assert types["a_bool"] == "string"


def test_kml_multigeometry_fanout():
    """unit/kml.js:489-551: one Placemark with point+line ->
    MultiPoint row + MultiLineString row, attributes cloned."""
    rows = kmlmod.parse_kml_document(
        open(f"{FIX}/points_and_lines_multigeom.kml", "rb").read()
    )
    assert [r["geom"]["type"] for r in rows[:2]] == ["MultiPoint", "MultiLineString"]
    assert rows[0]["geom"]["coordinates"] == [[102.0, 0.5]]
    assert rows[1]["geom"]["coordinates"] == [[[101.0, 0.0], [101.0, 1.0]]]
    assert rows[0]["properties"][0] == ("a_string", "first value", "string")
    assert rows[1]["properties"][0] == ("a_string", "first value", "string")


def test_kmz_multi_layer_28_rows():
    """unit/kmz.js:394-406 golden: 28 rows across zip entries."""
    rows = kmlmod.parse_kmz(open(f"{FIX}/multi_layer.kmz", "rb").read())
    assert len(rows) == 28


def test_kml_through_spark_layer_pipeline(spark):
    """simple_points.kml end-to-end: spans -> KML pandas UDF ->
    layer merge -> normalized rows."""
    text = open(f"{FIX}/simple_points.kml").read()
    docs = spark.createDataFrame(
        [("doc-0", [("geometry", text, "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    parsed = kmlmod.kml_geometry_spans(docs)
    assigned, layers = layersmod.merge_layers(parsed)
    assert len(layers) == 1
    assert _schema_of(layers[0]) == EXPECTED_POINTS_SCHEMA
    out = layersmod.normalize_layer(assigned, layers[0]).orderBy("a_string").collect()
    assert [r["a_string"] for r in out] == ["first value", "second value"]
    assert [r["a_bool"] for r in out] == [False, True]


def test_laundering_goldens():
    """unit/soql.js goldens."""
    assert naming.launder("foo") == "foo"
    assert naming.launder("fooBar") == "foo_bar"
    assert naming.launder("foo bar") == "foo_bar"
    assert naming.launder("FOOBAR") == "foobar"
    assert naming.launder("         foobar") == "foobar"
    assert naming.launder("FooBar") == "foo_bar"
    assert naming.launder("1_foo") == "_1_foo"
    assert naming.launder("_1_foo") == "_1_foo"
    assert naming.rename_attribute("the_geom") == "invalid_the_geom"
    assert naming.rename_attribute("The_Geom") == "invalid_the_geom"
    assert naming.dedupe(["foo_bar", "foo_bar", "foo_bar"]) == [
        "foo_bar", "foo_bar_1", "foo_bar_2",
    ]


def test_summary_shape(spark):
    """services/summary.js:10-93: per-layer count/projection/geomType/
    bbox/columns."""
    parsed = _features_df(spark, "simple_points.json")
    assigned, layers = layersmod.merge_layers(parsed)
    s = layersmod.layer_summary(assigned, layers)
    assert s[0]["count"] == 2
    assert s[0]["geomType"] == "point"
    assert s[0]["bbox"] == {"minx": 102.0, "miny": 0.5, "maxx": 103.0, "maxy": 1.5}
    assert [c["fieldName"] for c in s[0]["columns"]] == [
        "the_geom", "a_string", "a_num", "a_float", "a_bool",
    ]
    assert [c["dataTypeName"] for c in s[0]["columns"]] == [
        "point", "text", "number", "number", "checkbox",
    ]


def test_layer_spec_names(spark):
    """merger.js:72 + layer.js:106-127 golden: specs are assigned by
    first-seen layer position; spec name lands in the summary `name`,
    positions past the spec list default to layer_<idx>, and uid
    defaults to the EMPTY sentinel."""
    parsed = _features_df(spark, "multi_crs.json")  # opens 2 layers
    specs = [{"name": "A Layer Named Layer", "uid": "abcd-efgh"}]
    assigned, layers = layersmod.merge_layers(parsed, specs=specs)
    assert len(layers) == 2
    assert layers[0].name == "A Layer Named Layer"
    assert layers[0].uid == "abcd-efgh"
    assert layers[1].name == "layer_1"  # past the spec list
    assert layers[1].uid == layersmod.EMPTY_UID
    s = layersmod.layer_summary(assigned, layers)
    assert [e["name"] for e in s] == ["A Layer Named Layer", "layer_1"]
    assert [e["uid"] for e in s] == ["abcd-efgh", layersmod.EMPTY_UID]
    # bare-string shorthand and empty/None spec entries
    _, layers2 = layersmod.merge_layers(parsed, specs=["wards", None])
    assert [l.name for l in layers2] == ["wards", "layer_1"]
    # no specs at all -> positional defaults (layer.js:122)
    _, layers3 = layersmod.merge_layers(parsed)
    assert [l.name for l in layers3] == ["layer_0", "layer_1"]


def test_shapefile_goldens():
    """unit/shapefile.js:124-172 goldens: values + geometry promotion."""
    from geo_import_spark.sources import shapefile as shpmod

    rows = shpmod.parse_shapefile_zip(open(f"{FIX}/simple_points.zip", "rb").read())
    assert len(rows) == 2
    assert rows[0]["geom"] == {"type": "Point", "coordinates": [102.0, 0.5]}
    assert rows[0]["properties"] == [
        ("a_string", "first value", "string"),
        ("a_num", 2.0, "number"),
        ("a_float", 2.2, "number"),
        ("a_bool", 0.0, "number"),  # dbf stores booleans as numerics here
    ]
    lines = shpmod.parse_shapefile_zip(open(f"{FIX}/simple_lines.zip", "rb").read())
    assert lines[0]["geom"]["type"] == "MultiLineString"  # promotion G5
    polys = shpmod.parse_shapefile_zip(open(f"{FIX}/simple_polygons.zip", "rb").read())
    assert polys[0]["geom"]["type"] == "MultiPolygon"


def test_shapefile_missing_parts_error():
    from geo_import_spark.sources import shapefile as shpmod
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing .dbf"):
        shpmod.parse_shapefile_zip(open(f"{FIX}/missing_dbf.zip", "rb").read())
    with _pytest.raises(ValueError, match="missing .shp"):
        shpmod.parse_shapefile_zip(open(f"{FIX}/missing_shp.zip", "rb").read())


def test_shapefile_through_spark(spark):
    """Shapefile zip span -> pandas UDF -> layer merge pipeline."""
    import base64

    from geo_import_spark.sources import shapefile as shpmod

    b64 = base64.b64encode(open(f"{FIX}/simple_points.zip", "rb").read()).decode()
    docs = spark.createDataFrame(
        [("doc-0", [("geometry", b64, "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    parse = shpmod.make_shapefile_features_udf()
    s = docs.select("doc_id", F.explode("spans").alias("span"))
    g = s.select(
        "doc_id", F.col("span.offset").alias("span_offset"),
        F.explode(parse(F.col("span.text"))).alias("f"),
    ).select(
        "doc_id", "span_offset",
        F.col("f.geom").alias("geom"), F.col("f.properties").alias("properties"),
        F.col("f.props").alias("props"), F.col("f.crs").alias("crs"),
        F.col("f.error").alias("error"),
    )
    assigned, layers = layersmod.merge_layers(g)
    assert len(layers) == 1
    assert layers[0].geom_ctype == "point"
    out = layersmod.normalize_layer(assigned, layers[0]).orderBy("a_string").collect()
    assert [r["a_string"] for r in out] == ["first value", "second value"]
    assert [r["a_num"] for r in out] == [2.0, 2.0]


def test_decoder_dispatch(spark):
    """S5 dispatch: per-document format tag routes to the right
    decoder; all formats union into one parsed frame."""
    import base64

    from geo_import_spark.sources import dispatch

    assert dispatch.format_for_extension("foo.KML") == "kml"
    assert dispatch.format_for_extension("a.zip") == "shapefile"
    assert dispatch.format_for_content_type("application/vnd.geo+json") == "geojson"
    gj = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{"a":"x"}}'
    kml_text = open(f"{FIX}/simple_points.kml").read()
    shp_b64 = base64.b64encode(open(f"{FIX}/simple_points.zip", "rb").read()).decode()
    kmz_b64 = base64.b64encode(open(f"{FIX}/multi_layer.kmz", "rb").read()).decode()
    span = lambda t: [("geometry", t, "", 0)]  # noqa: E731
    docs = spark.createDataFrame(
        [
            ("d-gj", span(gj), "geojson"),
            ("d-kml", span(kml_text), "kml"),
            ("d-shp", span(shp_b64), "shapefile"),
            ("d-kmz", span(kmz_b64), "kmz"),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, format string",
    )
    out = dispatch.decode_geometry_spans(docs)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"d-gj": 1, "d-kml": 2, "d-shp": 2, "d-kmz": 28}
