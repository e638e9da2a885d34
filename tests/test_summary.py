"""Summary service modes (reference services/summary.js dispatch +
decoders/shapefile.js:293-320 quick path + manifest-only table
summary)."""

import io
import json
import zipfile

import pytest

from geo_import_spark.plans.table import Table
from geo_import_spark.services import summary as summod

FIX = "/root/reference/es6-test/fixtures"

WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_quick_shapefile_summary_reads_only_prj():
    """The .shp/.dbf entries are GARBAGE — any attempt to parse data
    would crash, so success proves the quick path reads only .prj."""
    blob = _zip(
        {
            "wards.shp": b"\xff" * 64,  # not a valid shapefile
            "wards.dbf": b"\xff" * 64,  # not a valid dbf
            "wards.prj": WGS84_WKT,
        }
    )
    out = summod.quick_shapefile_summary(blob)
    assert out == [
        {
            "count": 0,
            "projection": "GCS_WGS_1984",
            "name": "wards",
            "geometry": None,
            "bbox": {"minx": None, "miny": None, "maxx": None, "maxy": None},
            "columns": [],
        }
    ]


def test_quick_summary_multi_layer_and_fixture():
    blob = _zip(
        {
            "a.prj": WGS84_WKT,
            "b.prj": "+proj=somerc +lat_0=47.5 ...",
            "b.shp": b"junk",
        }
    )
    out = summod.quick_shapefile_summary(blob)
    assert [o["name"] for o in out] == ["a", "b"]
    assert out[1]["projection"].startswith("+proj=somerc")
    # real fixture zip routes the same way through summarize_blob
    real = open(f"{FIX}/simple_points.zip", "rb").read()
    via_dispatch = summod.summarize_blob(None, real, "shapefile")
    assert via_dispatch and all(o["count"] == 0 for o in via_dispatch)


def test_full_summary_small_geojson_blob(spark):
    blob = open(f"{FIX}/simple_points.json", "rb").read()
    out = summod.summarize_blob(spark, blob, "geojson", size=len(blob))
    assert len(out) == 1
    layer = out[0]
    assert layer["count"] == 2
    assert layer["geomType"] == "point"
    assert [c["fieldName"] for c in layer["columns"]][:2] == ["the_geom", "a_string"]


def test_abbreviated_summary_over_size_gate(spark):
    blob = open(f"{FIX}/simple_points.json", "rb").read()
    out = summod.summarize_blob(
        spark, blob, "geojson", size=summod.ABBREVIATE_SUMMARY_SIZE + 1
    )
    assert out == []
    # missing declared size == missing X-Blob-Length header: the
    # reference warns and abbreviates (summary.js:63-90)
    assert summod.summarize_blob(spark, blob, "geojson") == []


def test_table_summary_is_metadata_only(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, docs.select("doc_id", "n_chars"), stat_cols=["n_chars"],
             properties={"bbox": [1, 2, 3, 4]})
    # metadata-only: works with NO SparkSession in reach
    s = summod.table_summary(t)
    assert s["rows"] == docs.count()
    assert s["files"] >= 1
    assert s["properties"]["bbox"] == [1, 2, 3, 4]
    lo, hi = s["stats"]["min_n_chars"], s["stats"]["max_n_chars"]
    row = docs.selectExpr("min(n_chars)", "max(n_chars)").collect()[0]
    assert (lo, hi) == (row[0], row[1])


def test_full_summary_kml_blob(spark):
    """KML routes through the same full-summary dispatch (no quick
    path — canSummarizeQuickly is shapefile-only in the reference)."""
    blob = open(f"{FIX}/simple_points.kml", "rb").read()
    out = summod.summarize_blob(spark, blob, "kml", size=len(blob))
    assert len(out) == 1
    assert out[0]["count"] == 2
    assert out[0]["geomType"] == "point"


def test_kmz_summary_fans_out_per_entry(spark, monkeypatch):
    """VERDICT r3 #9: a multi-entry KMZ must not parse on one task —
    summarize_blob splits one document per .kml entry before the parse
    UDF (entry order preserved), so the parse stage parallelizes."""
    kml_a = open(f"{FIX}/simple_points.kml", "rb").read()
    kml_b = open(f"{FIX}/simple_lines.kml", "rb").read()
    blob = _zip({"a.kml": kml_a, "sub/b.kml": kml_b, "notes.txt": b"x"})

    captured = {}
    real = summod.full_summary

    def spy(sp, docs, fmt, specs=None):
        captured["n_docs"] = docs.count()
        captured["parts"] = docs.rdd.getNumPartitions()
        captured["fmt"] = fmt
        return real(sp, docs, fmt, specs=specs)

    monkeypatch.setattr(summod, "full_summary", spy)
    s = summod.summarize_blob(spark, blob, "kmz", size=len(blob))
    assert captured["n_docs"] == 2      # one document per .kml entry
    assert captured["parts"] > 1        # the parse stage gets >1 task
    assert captured["fmt"] == "kml"
    # both entries' layers surface: a point layer and a line layer
    assert sorted(e["geomType"] for e in s) == ["line", "point"]
    assert sum(e["count"] for e in s) == 4  # 2 points + 2 lines
