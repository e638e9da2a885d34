"""Semantic tests for functions/hilbert.py: the chained-step encode
must produce a true Hilbert curve (a Hamiltonian unit-step path over
the grid) and match the textbook xy2d reference."""

from pyspark.sql import functions as F

from geo_import_spark.functions import hilbert


def _xy2d_ref(bits: int, x: int, y: int) -> int:
    """Textbook per-bit xy2d (Wikipedia 'Hilbert curve')."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_textbook_reference(spark):
    bits = 6
    n = 1 << bits
    cells = spark.range(n * n).select(
        (F.col("id") % n).alias("gx0"), (F.col("id") / n).cast("long").alias("gy0")
    )
    # feed exact cell centers through the lon/lat grid transform
    pts = cells.select(
        "gx0", "gy0",
        ((F.col("gx0") + 0.5) / n * 360.0 - 180.0).alias("lon"),
        (90.0 - (F.col("gy0") + 0.5) / n * 180.0).alias("lat"),
    )
    rows = hilbert.hilbert_cols(pts, bits).collect()
    assert len(rows) == n * n
    for r in rows:
        assert (r.gx, r.gy) == (r.gx0, r.gy0)
        assert r.hd == _xy2d_ref(bits, r.gx, r.gy), (r.gx, r.gy)


def test_curve_is_hamiltonian_unit_path(spark):
    """All 4^bits indexes are distinct, cover [0, 4^bits), and
    consecutive indexes are grid neighbors (|dx| + |dy| == 1) — the
    locality property Z-order lacks."""
    bits = 5
    n = 1 << bits
    cells = spark.range(n * n).select(
        (F.col("id") % n).alias("gx0"), (F.col("id") / n).cast("long").alias("gy0")
    ).select(
        "gx0", "gy0",
        ((F.col("gx0") + 0.5) / n * 360.0 - 180.0).alias("lon"),
        (90.0 - (F.col("gy0") + 0.5) / n * 180.0).alias("lat"),
    )
    rows = hilbert.hilbert_cols(cells, bits).select("gx", "gy", "hd").collect()
    by_d = {r.hd: (r.gx, r.gy) for r in rows}
    assert sorted(by_d) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = by_d[d - 1], by_d[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_encode_is_pure_jvm_map(spark):
    pts = spark.createDataFrame(
        [("a", 1.0, 2.0)], "doc_id string, lon double, lat double"
    )
    plan = hilbert.hilbert_encode(pts)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_hilbert_sort_shrinks_per_file_extent(spark, tmp_path):
    """The payoff of the clustering key: rewriting a hash-scattered
    table sorted by hd makes every file spatially compact, so the
    summed per-file bbox area collapses (this is what makes min/max
    file stats selective for spatial predicates)."""
    from geo_import_spark import corpus
    from geo_import_spark.plans.table import Table
    from geo_import_spark.sources import geojson

    pts = hilbert.hilbert_cols(
        geojson.point_spans(
            corpus.documents(spark, "/root/testdata/sf0.001")
        )
    ).select("doc_id", "lon", "lat", "hd")

    def per_file_area(paths):
        df = spark.read.parquet(*paths)
        rows = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("lon") - F.min("lon")).alias("w"),
                (F.max("lat") - F.min("lat")).alias("h"),
            )
            .collect()
        )
        return sum(r.w * r.h for r in rows), len(rows)

    t = Table(str(tmp_path / "tbl"))
    # hash-scatter: every file spans the whole globe
    t.commit(spark, pts.repartition(8, "doc_id"), stat_cols=["hd"])
    files = [f["path"] for f in t.current_snapshot()["files"]]
    area_scattered, n1 = per_file_area(files)

    t.compact(
        spark,
        target_file_bytes=8 << 10,
        small_file_bytes=1 << 30,
        sort_by=["hd"],
        stat_cols=["hd"],
    )
    files2 = [f["path"] for f in t.current_snapshot()["files"]]
    area_sorted, n2 = per_file_area(files2)
    assert n1 >= 4 and n2 >= 4
    # scattered files each cover ~the full globe; hilbert-sorted files
    # cover compact patches — at least a 3x total-extent collapse
    assert area_sorted < area_scattered / 3, (area_sorted, area_scattered)
