"""Record-range fan-out for one large shapefile entry (VERDICT r4 #2):
the offset-index pass, range splitting, multi-task decode, and
row-for-row parity with the single-task whole-entry decode — including
deleted-DBF-record alignment across a range boundary."""

import struct
import zipfile

import pytest
from pyspark.sql import functions as F

from geo_import_spark.sources import shapefile as shpmod
from geo_import_spark.sources import shpsplit

N_RECS = 400
DELETED = {123, 250}  # one in each half, exercising cross-range alignment


def _shp_bytes(n):
    """n point records (record i at coordinate (i, -i))."""
    recs = b""
    for i in range(1, n + 1):
        content = struct.pack("<i2d", 1, float(i), float(-i))
        recs += struct.pack(">ii", i, len(content) // 2) + content
    header = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", (100 + len(recs)) // 2)
        + struct.pack("<ii", 1000, 1)
        + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    )
    return header + recs


def _dbf_bytes(n, deleted=frozenset()):
    field = (
        b"NAME".ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([10]) + b"\x00" * 15
    )
    header_size = 32 + 32 + 1
    record_size = 11
    header = (
        bytes([3, 24, 1, 1])
        + struct.pack("<I", n)
        + struct.pack("<HH", header_size, record_size)
        + b"\x00" * 20
        + field
        + b"\x0d"
    )
    recs = b""
    for i in range(n):
        flag = b"*" if i in deleted else b" "
        recs += flag + f"rec-{i}".ljust(10).encode()
    return header + recs


@pytest.fixture(scope="module")
def stored_zip(tmp_path_factory):
    p = tmp_path_factory.mktemp("shpsplit") / "big.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as z:
        z.writestr("big.shp", _shp_bytes(N_RECS))
        z.writestr("big.dbf", _dbf_bytes(N_RECS, DELETED))
    return str(p)


def test_split_plan_covers_all_records_contiguously(stored_zip):
    plan = shpsplit.shapefile_split_plan(stored_zip, target_bytes=2048)
    assert len(plan) > 4
    assert plan[0]["rec_start"] == 0
    total = 0
    for prev, cur in zip(plan, plan[1:]):
        assert cur["rec_start"] == prev["rec_start"] + prev["rec_count"]
        assert cur["byte_start"] == prev["byte_end"]
    total = sum(r["rec_count"] for r in plan)
    assert total == N_RECS


def test_ranged_decode_matches_whole_entry_decode(spark, stored_zip):
    with open(stored_zip, "rb") as f:
        expected = shpmod.parse_shapefile_zip(f.read())
    got = (
        shpsplit.ranged_shapefile_features(spark, stored_zip, target_bytes=2048)
        .orderBy("span_offset")
        .collect()
    )
    # whole-entry decode skips deleted rows silently; the ranged path
    # must produce exactly the same surviving rows in record order
    assert len(got) == len(expected) == N_RECS - len(DELETED)
    for g, e in zip(got, expected):
        assert g["geom"]["xs"] == [c[0] for c in [e["geom"]["coordinates"]]]
        assert g["geom"]["ys"] == [e["geom"]["coordinates"][1]]
        assert [
            (p["name"], p["value"], p["ctype"]) for p in g["props"]
        ] == [(n, str(v), c) for n, v, c in e["properties"]]
        assert g["crs"] == e["crs"]
        assert g["error"] is None


def test_decode_runs_on_multiple_tasks(spark, stored_zip):
    parts = (
        shpsplit.ranged_shapefile_features(spark, stored_zip, target_bytes=2048)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert parts > 1, "the parse stage must fan out across tasks"


def test_compressed_entry_refuses_range_decode(tmp_path):
    p = tmp_path / "deflated.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("big.shp", _shp_bytes(20))
        z.writestr("big.dbf", _dbf_bytes(20))
    with pytest.raises(ValueError, match="compressed"):
        shpsplit.shapefile_split_plan(str(p), target_bytes=2048)


def test_geometry_promotion_matches(spark, tmp_path):
    """A polygon record promotes to MultiPolygon on both paths."""
    ring = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", 0, 0, 4, 4)
    content += struct.pack("<2i", 1, len(ring))
    content += struct.pack("<i", 0)
    for x, y in ring:
        content += struct.pack("<2d", x, y)
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    shp = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", (100 + len(rec)) // 2)
        + struct.pack("<ii", 1000, 5)
        + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
        + rec
    )
    p = tmp_path / "poly.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as z:
        z.writestr("poly.shp", shp)
        z.writestr("poly.dbf", _dbf_bytes(1))
    row = shpsplit.ranged_shapefile_features(spark, str(p)).collect()[0]
    assert row["geom"]["gtype"] == "MultiPolygon"
    with open(p, "rb") as f:
        whole = shpmod.parse_shapefile_zip(f.read())[0]
    assert whole["geom"]["type"] == "MultiPolygon"
