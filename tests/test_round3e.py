"""Round-3 additions: within-distance (radius) spatial join — planar
and haversine modes — verified against NumPy brute force, including
near-pole and antimeridian-wrap queries where the per-query disk
cover's conservative bounds actually bite."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_import_spark.operators import knn as knnmod


def _points_df(spark, seed=3, n=4000):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-85, 85, n)
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "lon": lon, "lat": lat})
    return spark.createDataFrame(pdf), pdf


def _queries_df(spark, rows):
    return spark.createDataFrame(
        [Row(query_id=q, qlon=float(x), qlat=float(y)) for q, x, y in rows]
    )


def test_radius_join_planar_matches_bruteforce(spark):
    pts, pdf = _points_df(spark)
    qrows = [(f"q-{i}", x, y) for i, (x, y) in enumerate(
        [(0.0, 0.0), (100.0, 45.0), (-170.0, -60.0), (20.0, 80.0)]
    )]
    queries = _queries_df(spark, qrows)
    radius = 6.0
    got = {
        (r["query_id"], r["doc_id"])
        for r in knnmod.radius_join(queries, pts, radius=radius, level=6).collect()
    }
    want = set()
    for q, x, y in qrows:
        d = np.sqrt((pdf.lon.values - x) ** 2 + (pdf.lat.values - y) ** 2)
        want |= {(q, int(i)) for i in pdf.doc_id.values[d <= radius]}
    assert got == want and len(want) > 0


def test_radius_join_haversine_matches_bruteforce_incl_pole_and_wrap(spark):
    pts, pdf = _points_df(spark, seed=11)
    # near-pole (tiny cos(lat): dlon bound must widen to a full band)
    # and antimeridian (x-range must wrap) queries
    qrows = [
        ("q-pole", 10.0, 84.5),
        ("q-wrap", 179.5, 10.0),
        ("q-mid", -60.0, -30.0),
    ]
    queries = _queries_df(spark, qrows)
    radius = 800_000.0  # meters
    got = {
        (r["query_id"], r["doc_id"])
        for r in knnmod.radius_join(
            queries, pts, radius=radius, level=6, haversine=True
        ).collect()
    }
    R = knnmod.EARTH_RADIUS_M
    want = set()
    for q, x, y in qrows:
        rl1, rl2 = np.radians(y), np.radians(pdf.lat.values)
        dlat = np.radians(pdf.lat.values - y)
        dlon = np.radians(pdf.lon.values - x)
        a = np.sin(dlat / 2) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
        d = 2 * R * np.arcsin(np.sqrt(a))
        want |= {(q, int(i)) for i in pdf.doc_id.values[d <= radius]}
    assert got == want
    # sanity: every query matched something
    assert {q for q, _ in got} == {q for q, _, _ in qrows}


def test_radius_join_no_duplicate_pairs(spark):
    """A point's cell appears at most once per query cover — the join
    must emit each qualifying pair exactly once."""
    pts, _ = _points_df(spark, seed=5, n=1000)
    queries = _queries_df(spark, [("q-0", 0.0, 0.0)])
    out = knnmod.radius_join(queries, pts, radius=20.0, level=6)
    n = out.count()
    assert n == out.select("query_id", "doc_id").distinct().count()
    assert n > 0
