"""IDW surface interpolation (operators/tiling.py idw_surface):
exact semantics on hand-built inputs plus the scale-critical plan
shape. The driver oracle (``idw_surface``) pins the full closed-form
weight arithmetic against DuckDB; these tests pin the *meaning*."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_import_spark.operators import tiling

LEVEL = 6
N = 1 << LEVEL


def _cell_center(x, y):
    nf = float(N)
    return ((x + 0.5) / nf * 360.0 - 180.0, 90.0 - (y + 0.5) / nf * 180.0)


def _surface(spark, rows):
    pts = spark.createDataFrame([Row(lon=lo, lat=la, val=v) for lo, la, v in rows])
    return tiling.idw_surface(pts, F.col("val"), level=LEVEL)


def test_single_point_interpolates_exactly_to_its_value(spark):
    """One point: every contributed cell's estimate is exactly v
    ((w*v)/w with both sums < 2^53 — the division is exact)."""
    lon, lat = _cell_center(10, 20)
    out = _surface(spark, [(lon, lat, 7)]).collect()
    # interior cell -> its own cell plus all 8 neighbors
    assert len(out) == 9
    assert {(r["x"], r["y"]) for r in out} == {
        (10 + dx, 20 + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    }
    for r in out:
        assert r["idw_value"] == 7.0
        assert r["n_pts"] == 1


def test_equidistant_points_average_and_near_point_dominates(spark):
    cx, cy = _cell_center(32, 32)
    step = 360.0 / N
    # two points symmetric about the (32,32) center -> exact mean there
    out = _surface(
        spark, [(cx - step / 4, cy, 10), (cx + step / 4, cy, 20)]
    ).collect()
    center = next(r for r in out if (r["x"], r["y"]) == (32, 32))
    assert center["idw_value"] == 15.0
    assert center["n_pts"] == 2
    # at the cell east of center the nearer (v=20) point dominates
    east = next(r for r in out if (r["x"], r["y"]) == (33, 32))
    assert 15.0 < east["idw_value"] < 20.0


def test_corner_point_clamps_to_grid(spark):
    """A point in the corner cell contributes to the 4 in-bounds
    cells only — the neighbor explode must not emit x=-1/y=-1."""
    lon, lat = _cell_center(0, 0)
    out = _surface(spark, [(lon, lat, 3)]).collect()
    assert {(r["x"], r["y"]) for r in out} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_sample_density_matches_groupby_counts(spark):
    """Each point's annotated cell_density equals the count of points
    sharing its cell."""
    rows = [
        ( -1.0,  1.0, 0), (-1.1, 1.1, 0), (-1.2, 0.9, 0),  # same cell
        (100.0, 45.0, 0),                                   # lone cell
    ]
    pts = spark.createDataFrame(
        [Row(doc_id=f"d{i}", lon=lo, lat=la) for i, (lo, la, _) in enumerate(rows)]
    )
    out = {r["doc_id"]: r["cell_density"]
           for r in tiling.sample_density_at_points(pts, level=LEVEL).collect()}
    assert out == {"d0": 3, "d1": 3, "d2": 3, "d3": 1}


def test_sample_density_points_never_shuffle(spark, sf_dir):
    """The bounded grid broadcasts back onto the point side: the plan
    must show a BroadcastHashJoin and at most 2 shuffle exchanges
    (corpus spread + the map-side-combined cell aggregate)."""
    import io
    import contextlib

    import __spark_entry__ as entrymod

    df = entrymod.queries()["sample_density"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue().split("InMemoryTableScan")[0]
    assert "BroadcastHashJoin" in p
    assert "Python" not in p
    # both branches re-scan the corpus, so the round-robin spread
    # exchange may appear twice — but only ONE hash-partitioned
    # shuffle (the cell aggregate) is allowed: the point rows
    # themselves must never hash-shuffle.
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3
    assert len(re.findall(r"hashpartitioning\(x", p)) <= 1


def _pts_in_cells(spark, cells, per_cell=2, level=4):
    """per_cell points at each given (x, y) cell center."""
    rows = []
    n = 1 << level
    nf = float(n)
    for i, (x, y) in enumerate(cells):
        lon = (x + 0.5) / nf * 360.0 - 180.0
        lat = 90.0 - (y + 0.5) / nf * 180.0
        for j in range(per_cell):
            rows.append(Row(doc_id=f"d{i}-{j}", lon=lon, lat=lat))
    return spark.createDataFrame(rows)


def test_dense_regions_four_connectivity(spark):
    """An L-shaped run of cells is ONE region (transitive across both
    axes); a diagonal-only neighbor is a SEPARATE region (4-conn, not
    8); a far-away cell is its own region; sparse cells are dropped."""
    L = [(2, 2), (3, 2), (4, 2), (4, 3), (4, 4)]  # L-shape
    diag = [(5, 5)]          # touches (4,4) only diagonally
    lone = [(10, 10)]
    pts = _pts_in_cells(spark, L + diag + lone, per_cell=2)
    # one sparse cell below threshold
    sparse = _pts_in_cells(spark, [(0, 0)], per_cell=1)
    out = tiling.label_dense_regions(
        pts.unionByName(sparse), level=4, min_points=2
    ).collect()
    regions = {(r["x"], r["y"]): r["region_id"] for r in out}
    assert (0, 0) not in regions                       # sparse dropped
    assert len({regions[c] for c in L}) == 1           # L is one region
    assert regions[(5, 5)] != regions[(4, 4)]          # no 8-connectivity
    assert regions[(10, 10)] not in {regions[(4, 4)], regions[(5, 5)]}
    # region id = lexicographic min zero-padded cell key of the region
    assert regions[(2, 2)] == "c002002"
    assert regions[(5, 5)] == "c005005"


def test_idw_plan_is_jvm_only_single_aggregate_shuffle(spark, sf_dir):
    import io
    import contextlib

    import __spark_entry__ as entrymod

    df = entrymod.queries()["idw_surface"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue().split("InMemoryTableScan")[0]
    assert "Python" not in p
    # corpus-spread exchange + ONE aggregate shuffle on (x, y); a
    # third exchange means the map-side combine was lost
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    assert "HashAggregate" in p


def test_dense_regions_no_key_collision_at_deep_level(spark):
    """ADVICE r3: lpad(x, 3) TRUNCATES 4-digit coords, so at level 10
    cells (1000, 0) and (100, 0) collided into key 'c100000' and far
    apart regions silently merged. The %0Nd width now grows with the
    level: both cells label as their own region."""
    pts = _pts_in_cells(spark, [(1000, 0), (100, 0)], per_cell=2, level=10)
    out = tiling.label_dense_regions(pts, level=10, min_points=2).collect()
    regions = {(r["x"], r["y"]): r["region_id"] for r in out}
    assert len(regions) == 2
    assert regions[(1000, 0)] != regions[(100, 0)]
    # 4-digit zero-padded keys, no truncation
    assert regions[(100, 0)] == "c01000000"
    assert regions[(1000, 0)] == "c10000000"
