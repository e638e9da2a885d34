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
