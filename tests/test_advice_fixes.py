"""Regression tests for round-1 review findings (ADVICE.md):
DBF deleted-record alignment, JS Number() guesser parity, bare-Point
span agreement between the JVM and pandas parse paths, and media
spans not duplicating across pipeline units."""

import io
import struct
import zipfile

import pytest
from pyspark.sql import functions as F

from geo_import_spark.sources import geojson, shapefile as shpmod
from geo_import_spark.sources.kml import _js_number


def _shp_bytes(points):
    recs = b""
    for i, (x, y) in enumerate(points, 1):
        content = struct.pack("<i2d", 1, x, y)
        recs += struct.pack(">ii", i, len(content) // 2) + content
    header = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", (100 + len(recs)) // 2)
        + struct.pack("<ii", 1000, 1)
        + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    )
    return header + recs


def _dbf_bytes(values, deleted=frozenset()):
    field = b"NAME".ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([10]) + b"\x00" * 15
    header_size = 32 + 32 + 1
    record_size = 11
    header = (
        bytes([3, 24, 1, 1])
        + struct.pack("<I", len(values))
        + struct.pack("<HH", header_size, record_size)
        + b"\x00" * 20
    )
    body = b""
    for i, v in enumerate(values):
        flag = b"*" if i in deleted else b" "
        body += flag + v.encode().ljust(10)
    return header + field + b"\x0d" + body


def _zip_bytes(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_dbf_deleted_record_keeps_shp_alignment():
    """A deleted DBF record must NOT shift later records' attributes
    onto the wrong geometry (positional pairing with .shp)."""
    data = _zip_bytes(
        {
            "t.shp": _shp_bytes([(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)]),
            "t.dbf": _dbf_bytes(["a", "b", "c"], deleted={1}),
        }
    )
    rows = shpmod.parse_shapefile_zip(data)
    assert len(rows) == 2
    got = [(r["geom"]["coordinates"][0], r["properties"][0][1]) for r in rows]
    assert got == [(1.0, "a"), (3.0, "c")]


def test_dbf_no_deleted_records_unchanged():
    data = _zip_bytes(
        {
            "t.shp": _shp_bytes([(1.0, 1.0), (2.0, 2.0)]),
            "t.dbf": _dbf_bytes(["a", "b"]),
        }
    )
    rows = shpmod.parse_shapefile_zip(data)
    assert [(r["properties"][0][1]) for r in rows] == ["a", "b"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1_0", None),  # JS NaN; Python float() would give 10.0
        ("0x10", 16.0),  # JS hex; Python float() rejects
        ("0b101", 5.0),
        ("0o17", 15.0),
        ("-0x10", None),  # sign + hex is NaN in JS
        ("inf", None),  # only the exact 'Infinity' spellings are numbers
        ("nan", None),
        ("Infinity", float("inf")),
        ("-Infinity", float("-inf")),
        ("1e3", 1000.0),
        (".5", 0.5),
        ("5.", 5.0),
        ("-2.25", -2.25),
        ("12abc", None),
    ],
)
def test_js_number_parity(raw, expected):
    assert _js_number(raw) == expected


DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _feature(lon, lat):
    return (
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[%s,%s]},'
        '"properties":{}}' % (lon, lat)
    )


def test_point_spans_accepts_bare_point(spark):
    """The JVM fast path and the pandas path agree on which rows
    exist when a geometry span carries a bare Point (no Feature
    wrapper)."""
    bare = '{"type":"Point","coordinates":[7.5,8.5]}'
    docs = spark.createDataFrame(
        [
            ("d1", [("geometry", _feature(1.0, 2.0), "", 0)]),
            ("d2", [("geometry", bare, "", 0)]),
        ],
        DOCS_SCHEMA,
    )
    fast = geojson.point_spans(docs).orderBy("doc_id").collect()
    slow = geojson.geometry_spans(docs).filter(F.col("error").isNull()).collect()
    assert [r["doc_id"] for r in fast] == ["d1", "d2"]
    assert len(slow) == 2
    bare_row = fast[1]
    assert (bare_row["lon"], bare_row["lat"]) == (7.5, 8.5)
    assert bare_row["properties"] == "{}"
    assert bare_row["crs"] == geojson.DEFAULT_CRS


def test_pipeline_media_tiled_once_per_span(spark, tmp_path):
    """A doc whose geometry spans fall in two different level-3 units
    must still tile each media span exactly once (anchor unit comes
    from the anchor's own location, not from every geometry span)."""
    from geo_import_spark.functions import geomkern
    from geo_import_spark.plans import pipeline as pipe
    from geo_import_spark.sources.geojson import GEOM_TYPE

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("geometry", _feature(-100.0, 10.0), "", 0),
                    ("geometry", _feature(100.0, 10.0), "", 1),
                    ("media", "", "media://1", 2),
                ],
            )
        ],
        DOCS_SCHEMA,
    )
    ring = [[-110.0, 0.0], [-90.0, 0.0], [-90.0, 20.0], [-110.0, 20.0], [-110.0, 0.0]]
    po, ro, xs, ys = geomkern.flatten_geojson_coords("Polygon", [ring])
    from pyspark.sql import types as T

    polys = spark.createDataFrame(
        [("p1", ("Polygon", po, ro, xs, ys))],
        T.StructType(
            [
                T.StructField("poly_id", T.StringType()),
                T.StructField("geom", GEOM_TYPE),
            ]
        ),
    )
    out = str(tmp_path / "pipe")
    pipe.run_pipeline(spark, "synthetic", out, docs_df=docs, polys_df=polys)
    tiles = spark.read.parquet(f"{out}/tiles")
    assert tiles.count() == 1  # one media span -> exactly one tile row
    pts = spark.read.parquet(f"{out}/points")
    assert pts.select("unit").distinct().count() == 2  # spans really span units
