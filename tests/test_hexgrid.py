"""Semantic tests for functions/hexgrid.py: the axial hex transform,
cube rounding, and the encode/decode inverse pair."""

import math

from pyspark.sql import functions as F

from geo_import_spark.functions import hexgrid


def test_origin_is_cell_zero(spark):
    df = spark.createDataFrame(
        [("o", 0.0, 0.0)], "doc_id string, lon double, lat double"
    )
    r = hexgrid.hex_cols(df, 8).collect()[0]
    assert (r.hq, r.hr) == (0, 0)


def test_center_roundtrip_grid(spark):
    """encode(center(q, r)) == (q, r): the cube rounding maps every
    hex center back to its own cell, across a signed coordinate grid
    and two resolutions."""
    cells = spark.range(-6, 7).selectExpr("id AS q").crossJoin(
        spark.range(-6, 7).selectExpr("id AS r")
    )
    for res in (7, 10):
        s = hexgrid.size_for_res(res)
        cx, cy = hexgrid.hex_center_exprs("q", "r", s)
        pts = cells.select(
            "q", "r",
            F.expr(cx).alias("lon"),
            F.expr(cy).alias("lat"),
        )
        bad = (
            hexgrid.hex_cols(pts, res)
            .filter("hq <> q OR hr <> r")
            .count()
        )
        assert bad == 0, res


def test_nearest_center_assignment(spark):
    """A point strictly inside a hex (offset well under the inradius
    from the center) encodes to that hex."""
    res = 8
    s = hexgrid.size_for_res(res)
    inradius = s * math.sqrt(3.0) / 2.0
    cx, cy = hexgrid.hex_center_exprs("q", "r", s)
    cells = spark.createDataFrame(
        [(3, -2), (-5, 4), (0, 0)], "q long, r long"
    )
    pts = cells.select(
        "q", "r",
        (F.expr(cx) + 0.4 * inradius).alias("lon"),
        (F.expr(cy) - 0.3 * inradius).alias("lat"),
    )
    assert hexgrid.hex_cols(pts, res).filter("hq <> q OR hr <> r").count() == 0


def test_density_counts_and_centers(spark):
    """hex_density counts points per cell and decodes the center of
    the right cell."""
    res = 8
    s = hexgrid.size_for_res(res)
    cx, cy = hexgrid.hex_center_exprs("q", "r", s)
    center = (
        spark.createDataFrame([(2, 1)], "q long, r long")
        .select(F.expr(cx).alias("x"), F.expr(cy).alias("y"))
        .collect()[0]
    )
    pts = spark.createDataFrame(
        [(f"d{i}", center.x + 0.001 * i, center.y) for i in range(5)],
        "doc_id string, lon double, lat double",
    )
    rows = hexgrid.hex_density(pts, res).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.hq, r.hr, r.n) == (2, 1, 5)
    assert abs(r.cx - center.x) < 1e-12 and abs(r.cy - center.y) < 1e-12


def test_encode_is_pure_jvm_map(spark):
    """The encode plan has no Python evaluation and no exchange; the
    density plan has exactly one exchange (the (hq, hr) hash
    aggregate), still no Python."""
    pts = spark.createDataFrame(
        [("a", 1.0, 2.0)], "doc_id string, lon double, lat double"
    )
    enc_plan = hexgrid.hex_cols(pts, 8)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in enc_plan and "Exchange" not in enc_plan
    den_plan = hexgrid.hex_density(pts, 8)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in den_plan
    assert den_plan.count("Exchange") == 1


def test_kring_offsets_shape():
    for k in (1, 2, 3):
        offs = hexgrid.kring_offsets(k)
        assert len(offs) == 3 * k * (k + 1) + 1
        assert len(set(offs)) == len(offs)
        assert (0, 0) in offs


def test_hex_smooth_neighbor_sums(spark):
    """Points in two adjacent hexes and one far hex: own counts and
    ring-1 sums come out exactly, and empty border cells surface with
    n_self = 0."""
    res = 8
    s = hexgrid.size_for_res(res)
    cx, cy = hexgrid.hex_center_exprs("q", "r", s)
    centers = {
        (0, 0): 3,   # three points
        (1, 0): 2,   # adjacent -> mutual smoothing
        (40, 40): 1,  # far away
    }
    cells = spark.createDataFrame(
        [(q, r, n) for (q, r), n in centers.items()], "q long, r long, n int"
    ).select("q", "r", "n", F.expr(cx).alias("x"), F.expr(cy).alias("y"))
    pts = cells.select(
        "q", "r", F.expr("explode(sequence(1, n))").alias("i"), "x", "y"
    ).select(
        F.concat(F.lit("d"), "q", F.lit("_"), "r", F.lit("_"), "i").alias("doc_id"),
        F.col("x").alias("lon"),
        F.col("y").alias("lat"),
    )
    got = {
        (r.hq, r.hr): (r.n_self, r.n_smooth)
        for r in hexgrid.hex_smooth(pts, res=res, k=1).collect()
    }
    assert got[(0, 0)] == (3, 5)
    assert got[(1, 0)] == (2, 5)
    assert got[(40, 40)] == (1, 1)
    # empty cell adjacent to BOTH occupied cells — its axial ring
    # contains (0,0) via (0,-1) and (1,0) via (1,-1)
    assert got[(0, 1)] == (0, 5)
    # far cell's empty neighbor sees only it
    assert got[(40, 41)] == (0, 1)


def test_hex_hotspots_matches_python_reference(spark):
    """Gi* z-scores match a pure-Python evaluation of the same
    formula on the same occupied-cell universe (corpus points at the
    operator's default coarse resolution)."""
    import math

    from geo_import_spark import corpus
    from geo_import_spark.operators import spatialstats
    from geo_import_spark.sources import geojson

    pts = geojson.point_spans(
        corpus.documents(spark, "/root/testdata/sf0.001")
    )
    rows = spatialstats.hex_hotspots(pts).collect()
    assert len(rows) > 50
    dens = {(r.hq, r.hr): r.n for r in rows}
    n_cells = len(dens)
    s1 = sum(dens.values())
    s2 = sum(v * v for v in dens.values())
    mean = s1 / n_cells
    var = s2 / n_cells - mean * mean
    offs = hexgrid.kring_offsets(1)
    nontrivial = 0
    for r in rows:
        hood = [
            dens[(r.hq + dq, r.hr + dr)]
            for dq, dr in offs
            if (r.hq + dq, r.hr + dr) in dens
        ]
        assert r.w == len(hood) and r.g == sum(hood), (r.hq, r.hr)
        if n_cells > 1 and var > 0 and n_cells > r.w:
            z = (r.g - mean * r.w) / (
                math.sqrt(var)
                * math.sqrt((n_cells * r.w - r.w * r.w) / (n_cells - 1))
            )
            assert abs(r.z - z) < 1e-9, (r.hq, r.hr)
            if r.w > 1:
                nontrivial += 1
        else:
            assert r.z is None
    assert nontrivial > 0


def test_streaming_hex_density_matches_batch(spark, sf_dir, tmp_path):
    """The hex encode is a stateless JVM map, so it runs unchanged
    under readStream; a complete-mode windowless aggregate reproduces
    the batch density exactly."""
    from geo_import_spark import corpus
    from geo_import_spark.sources import geojson

    pts = geojson.point_spans(corpus.documents(spark, sf_dir)).select(
        "doc_id", "lon", "lat"
    )
    batch = {
        (r.hq, r.hr): r.n for r in hexgrid.hex_density(pts, 8).collect()
    }
    src = str(tmp_path / "pts_src")
    pts.write.parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    dens = hexgrid.hex_density(stream, 8)
    assert dens.isStreaming
    q = (
        dens.writeStream.format("memory")
        .queryName("stream_hex")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.hq, r.hr): r.n
        for r in spark.sql("SELECT * FROM stream_hex").collect()
    }
    assert got == batch
