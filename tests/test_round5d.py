"""Semantic + plan-shape tests for the round-5 batch-5 operators:
m4_downsample, ewma_scan, getis_ord, link_prediction, line_densify,
session_paths. Value-level parity vs DuckDB runs in
test_oracle_parity; these assert the semantics the oracle mirror
cannot see (invariants, planted structure, plan shape)."""

import io
import re
import contextlib

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from geo_import_spark import corpus
from geo_import_spark.operators import (
    graph as graphmod,
    lineref,
    spatialstats,
    temporal,
    timeseries as tsmod,
)


def _plan(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --- m4_downsample ---------------------------------------------------------


def test_m4_bucket_invariants(events):
    rows = tsmod.m4_downsample(events).collect()
    assert rows
    total = sum(r.n for r in rows)
    assert total == events.count()
    for r in rows:
        assert r.t_first_us <= r.t_min_us <= r.t_last_us
        assert r.t_first_us <= r.t_max_us <= r.t_last_us
        assert r.v_min_mi <= r.v_first_mi <= r.v_max_mi
        assert r.v_min_mi <= r.v_last_mi <= r.v_max_mi


def test_m4_single_shuffle(spark, sf_dir):
    # the whole operator is one map-side-combined aggregate: exactly
    # one Exchange in the plan, zero Python stages
    p = _plan(spark, sf_dir, "m4_downsample")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Python" not in p


def test_m4_matches_bruteforce(events):
    got = {
        (r.event_type, r.bucket_id): r
        for r in tsmod.m4_downsample(events).collect()
    }
    raw = events.select(
        "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vmi"),
    ).collect()
    buckets = {}
    for r in raw:
        buckets.setdefault(
            (r.event_type, r.us // tsmod.M4_BUCKET_US), []
        ).append(r)
    assert set(buckets) == set(got)
    for key, rows in buckets.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        g = got[key]
        assert g.n == len(rows)
        assert g.v_first_mi == rows[0].vmi and g.t_first_us == rows[0].us
        assert g.v_last_mi == rows[-1].vmi and g.t_last_us == rows[-1].us
        assert g.v_min_mi == min(r.vmi for r in rows)
        assert g.v_max_mi == max(r.vmi for r in rows)
        # min/max timestamps: earliest row attaining the extreme
        assert g.t_min_us == min(
            (r.us, r.event_id) for r in rows if r.vmi == g.v_min_mi
        )[0]
        assert g.t_max_us == min(
            (r.us, r.event_id) for r in rows if r.vmi == g.v_max_mi
        )[0]


# --- ewma_scan -------------------------------------------------------------


def test_ewma_matches_python_recurrence(events):
    got = tsmod.ewma_scan(events).collect()
    raw = events.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vmi"),
    ).collect()
    series = {}
    for r in raw:
        series.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in series.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        y = None
        for i, r in enumerate(rows, 1):
            y = r.vmi if y is None else (r.vmi + y) >> 1
            expect[(uid, i)] = (r.us, r.event_id, r.vmi, y)
    assert len(got) == len(expect)
    for g in got:
        assert expect[(g.user_id, g.i)] == (
            g.us, g.event_id, g.vmi, g.ewma_mi
        )


def test_ewma_stays_within_series_range(events):
    out = tsmod.ewma_scan(events)
    bad = out.join(
        out.groupBy("user_id").agg(
            F.min("vmi").alias("lo"), F.max("vmi").alias("hi")
        ),
        "user_id",
    ).filter((F.col("ewma_mi") < F.col("lo") - 1)
             | (F.col("ewma_mi") > F.col("hi")))
    assert bad.count() == 0


# --- getis_ord -------------------------------------------------------------


def test_getis_ord_planted_hotspot(spark):
    # 500 points piled on one spot + a sparse uniform background:
    # the pile's cell must come out hot99, and far-away singleton
    # cells must not be hot
    n_bg = 200
    pts = spark.range(500).select(
        F.lit(10.001).alias("lon"), F.lit(10.001).alias("lat")
    ).union(
        spark.range(n_bg).select(
            (F.col("id") * 1.7 - 170.0).alias("lon"),
            (F.col("id") * 0.8 - 80.0).alias("lat"),
        )
    )
    rows = spatialstats.getis_ord(pts).collect()
    hot = [r for r in rows if r.cnt >= 500]
    assert len(hot) == 1 and hot[0].label == "hot99" and hot[0].z > 2.576
    # background singletons well away from the pile stay non-hot
    for r in rows:
        if r.cnt == 1 and r.l_i <= 3:
            assert r.label in ("ns", "cold95", "cold99")


def test_getis_ord_label_consistent_with_z(spark, sf_dir):
    rows = entrymod.queries()["getis_ord"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.z is None:
            assert r.label == "ns"
        elif r.z >= 2.576:
            assert r.label == "hot99"
        elif r.z >= 1.96:
            assert r.label == "hot95"
        elif r.z <= -2.576:
            assert r.label == "cold99"
        elif r.z <= -1.96:
            assert r.label == "cold95"
        else:
            assert r.label == "ns"


# --- link_prediction -------------------------------------------------------


def test_link_prediction_candidates_are_nonedges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    preds = graphmod.link_prediction(li)
    edges = graphmod._part_edges_sparse(li)
    overlap = preds.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
    )
    assert overlap.count() == 0
    for r in preds.collect():
        assert r.u < r.w
        assert 1 <= r.cn <= min(r.deg_u, r.deg_w)
        assert 0.0 < r.jaccard <= 1.0


def test_link_prediction_score_on_planted_wedge(spark):
    # tiny explicit graph via a fake lineitem: orders {1:(a,b),
    # 2:(b,c)} with sparsify=1 gives edges a-b, b-c; the only
    # candidate is (a, c) with cn=1, deg 1+1 => jaccard 1/(1+1-1)=1
    li = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 200), (2, 300)],
        "l_orderkey long, l_partkey long",
    )
    edges = graphmod._part_edges_sparse(li, sparsify=1)
    assert {(r.src, r.dst) for r in edges.collect()} == {
        (100, 200), (200, 300)
    }
    rows = graphmod.link_prediction(li, sparsify=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.u, r.w, r.cn, r.deg_u, r.deg_w, r.jaccard) == (
        100, 300, 1, 1, 1, 1.0
    )


# --- line_densify ----------------------------------------------------------


def test_line_densify_endpoints_and_lattice(spark, sf_dir):
    segs = corpus.line_segments_a(spark, sf_dir)
    out = lineref.line_densify(segs)
    n = lineref.DENSIFY_SUB
    assert out.count() == segs.count() * (n + 1)
    j = out.join(segs, "line_id")
    ep = j.filter(
        ((F.col("i") == 0)
         & ((F.col("pxn") != n * F.col("x1"))
            | (F.col("pyn") != n * F.col("y1"))))
        | ((F.col("i") == n)
           & ((F.col("pxn") != n * F.col("x2"))
              | (F.col("pyn") != n * F.col("y2"))))
    )
    assert ep.count() == 0
    # interior vertices sit on the segment's exact parametric line
    mid = j.filter(
        F.col("pxn") * n
        != n * n * F.col("x1") + F.col("i") * n * (F.col("x2") - F.col("x1"))
    )
    assert mid.count() == 0


def test_line_densify_is_map_only(spark, sf_dir):
    # the only Exchange is the input generator's spread_scan
    # round-robin (absent on any real multi-partition table); the
    # operator itself adds no hash shuffle and no Python stage
    p = _plan(spark, sf_dir, "line_densify")
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1
    assert "hashpartitioning" not in p
    assert "Python" not in p


# --- session_paths ---------------------------------------------------------


def test_session_paths_counts_match_sessionize(events, spark):
    from geo_import_spark.streaming import events as eventsmod

    out = temporal.session_paths(events, top_k=10**9).collect()
    n_sessions = sum(r.n_sessions for r in out)
    # same gap rule at second precision vs µs precision can differ
    # only if a gap sits exactly at the 30-min boundary in one unit
    # and not the other; the corpus timestamps are whole seconds, so
    # the session count must agree with the sessionize operator
    assert n_sessions == eventsmod.sessionize(events).count()
    for r in out:
        assert r.n_users <= r.n_sessions
        assert ">" in r.path or r.path  # non-empty


def test_session_paths_single_user_exchange(spark, sf_dir):
    # one hash exchange on user_id feeds both windows; the only other
    # exchanges are the path-count aggregate and the top-k singleton
    p = _plan(spark, sf_dir, "session_paths")
    assert len(re.findall(r"hashpartitioning\(user_id", p)) <= 1
    assert "Python" not in p


# --- interval_coverage -----------------------------------------------------


def test_interval_coverage_matches_bruteforce(events):
    got = {r.user_id: r for r in temporal.interval_coverage(events).collect()}
    raw = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vmi"),
    ).collect()
    series = {}
    for r in raw:
        series.setdefault(r.user_id, []).append((r.us, r.us + r.vmi))
    for uid, ivs in series.items():
        ivs.sort()
        islands, cur_s, cur_e = [], None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append(cur_e - cur_s)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append(cur_e - cur_s)
        g = got[uid]
        assert g.n_intervals == len(ivs)
        assert g.n_islands == len(islands)
        assert g.covered_us == sum(islands)


def test_interval_coverage_single_user_exchange(spark, sf_dir):
    p = _plan(spark, sf_dir, "interval_coverage")
    assert len(re.findall(r"hashpartitioning\(user_id", p)) <= 1
    assert "Python" not in p


# --- seasonal_profile ------------------------------------------------------


def test_seasonal_profile_invariants(events):
    rows = temporal.seasonal_profile(events).collect()
    assert rows
    assert len(rows) <= 5 * 7 * 24  # types x dow x hod bound
    assert sum(r.n for r in rows) == events.count()
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
        assert r.mean_mi == r.sum_mi / r.n


def test_seasonal_profile_dow_matches_calendar(spark):
    # 2024-01-01 was a Monday => dow 0 with the (days+3)%7 rule
    one = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", 7, "x", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = temporal.seasonal_profile(one).collect()[0]
    assert (r.dow, r.hod) == (0, 5)


def test_seasonal_profile_single_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "seasonal_profile")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Python" not in p


# --- plan pins for the lineage-checkpointed frames -------------------------


def test_getis_ord_single_point_pass(spark, sf_dir):
    # the occupied-cell histogram is lineage-pinned: the final plan
    # contains NO parquet scans (the single point pass ran at
    # checkpoint creation) and only the grid + hood exchanges
    p = _plan(spark, sf_dir, "getis_ord")
    assert len(re.findall(r"Scan parquet", p)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    assert "Python" not in p


def test_link_prediction_single_lineitem_pass(spark, sf_dir):
    # the sparsified edge list is lineage-pinned: its six consumers
    # must not re-expand the distinct+self-join subtree (36 scans
    # before the pin; 0 after)
    p = _plan(spark, sf_dir, "link_prediction")
    assert len(re.findall(r"Scan parquet", p)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 10
    assert "Python" not in p


def test_ewma_single_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "ewma_scan")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "Python" not in p


# --- enforced scale guards -------------------------------------------------


def test_session_paths_drops_oversized_sessions(spark):
    # two users: one 3-event session, one 5-event session; with
    # max_len=4 the long session must vanish BEFORE the path build
    rows = []
    for i in range(3):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "a", 1.0, "{}"))
    for i in range(5):
        rows.append((10 + i, f"2024-01-01 00:{i:02d}:00", 2, "b", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = temporal.session_paths(ev, max_len=4).collect()
    assert {r.path for r in got} == {"a>a>a"}
    full = temporal.session_paths(ev, max_len=5).collect()
    assert {r.path for r in full} == {"a>a>a", "b>b>b>b>b"}


def test_ewma_drops_oversized_series(spark, monkeypatch):
    from geo_import_spark.operators import timeseries as ts

    rows = [(i, f"2024-01-01 00:{i:02d}:00", 1, "a", 1.0, "{}")
            for i in range(5)]
    rows += [(10, "2024-01-01 00:00:00", 2, "a", 1.0, "{}")]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(ts, "EWMA_MAX_N", 4)
    got = ts.ewma_scan(ev).collect()
    assert {r.user_id for r in got} == {2}


def test_link_prediction_hub_middle_is_excluded(spark):
    # star graph: hub 1 connects to 2..6; every leaf pair is a
    # 2-hop candidate THROUGH the hub. With max_mid_deg below the
    # hub degree, all wedges die -> zero predictions; with a high
    # cap the C(5,2)=10 leaf pairs appear.
    rows = [(i, 1) for i in range(2, 7)]
    li = spark.createDataFrame(
        [(o, p) for o, hub in rows for p in (hub, o + 100)],
        "l_orderkey long, l_partkey long",
    )
    # orders o=2..6 each contain parts {1, o+100}: hub part 1 has
    # degree 5, leaves degree 1
    full = graphmod.link_prediction(li, sparsify=1, max_mid_deg=10**6)
    assert full.count() == 10
    capped = graphmod.link_prediction(li, sparsify=1, max_mid_deg=4)
    assert capped.count() == 0


# --- areal_weights ---------------------------------------------------------


def test_areal_weights_conserve_mass(spark, sf_dir):
    rows = entrymod.queries()["areal_weights"](spark, sf_dir).collect()
    assert rows
    by_subj = {}
    for r in rows:
        by_subj.setdefault(r.subject_id, []).append(r)
    for sid, rs in by_subj.items():
        tot2 = rs[0].tot2
        value = rs[0].value
        assert sum(r.cross2 for r in rs) == tot2       # exact
        assert sum(r.contrib_num for r in rs) == value * tot2  # exact
        assert abs(sum(r.w for r in rs) - 1.0) < 1e-9  # float rollup
        for r in rs:
            assert 0.0 < r.w <= 1.0
            assert r.contrib_num == r.value * r.cross2


# --- segment_raster_cells --------------------------------------------------


def _supercover_py(x1, y1, x2, y2, g):
    """Python mirror: candidate bbox cells decided by exact
    segment-vs-cell geometry via Fractions (no float error)."""
    from fractions import Fraction
    import math

    cells = set()
    cx0, cx1 = sorted((math.floor(x1 / g), math.floor(x2 / g)))
    cy0, cy1 = sorted((math.floor(y1 / g), math.floor(y2 / g)))
    dx, dy = x2 - x1, y2 - y1
    for cx in range(cx0, cx1 + 1):
        for cy in range(cy0, cy1 + 1):
            gx0, gx1 = cx * g, (cx + 1) * g
            gy0, gy1 = cy * g, (cy + 1) * g
            if (gx0 <= x1 <= gx1 and gy0 <= y1 <= gy1) or (
                gx0 <= x2 <= gx1 and gy0 <= y2 <= gy1
            ):
                cells.add((cx, cy))
                continue
            # clip the segment's parameter interval to the cell slab
            t0, t1 = Fraction(0), Fraction(1)
            ok = True
            for p, q in ((-dx, x1 - gx0), (dx, gx1 - x1),
                         (-dy, y1 - gy0), (dy, gy1 - y1)):
                if p == 0:
                    if q < 0:
                        ok = False
                        break
                else:
                    r = Fraction(q, p)
                    if p < 0:
                        t0 = max(t0, r)
                    else:
                        t1 = min(t1, r)
            if ok and t0 <= t1:
                cells.add((cx, cy))
    return cells


def test_segment_raster_matches_fraction_mirror(spark):
    # segments chosen to make the bbox cover a strict superset:
    # a long shallow diagonal misses the bbox's corner cells
    g = 100
    segs = [
        ("diag", 5, 5, 295, 95),     # 3x1 cells, crosses all 3
        ("steep", 10, 10, 90, 290),  # 1x3
        ("corner", 10, 190, 190, 10),  # 2x2 bbox; misses NE cell? exact
        ("ongrid", 0, 0, 300, 0),    # rides the y=0 boundary
        ("inside", 120, 120, 130, 160),  # single cell
    ]
    df = spark.createDataFrame(
        segs, "line_id string, x1 long, y1 long, x2 long, y2 long"
    )
    from geo_import_spark.operators import linejoin as lj

    got = {}
    for r in lj.segment_raster_cells(df, grid=g).collect():
        got.setdefault(r.line_id, set()).add((r.cx, r.cy))
    for line_id, x1, y1, x2, y2 in segs:
        assert got.get(line_id, set()) == _supercover_py(
            x1, y1, x2, y2, g
        ), line_id


def test_segment_raster_subset_of_cover(spark, sf_dir):
    from geo_import_spark.operators import linejoin as lj

    segs = corpus.line_segments_a(spark, sf_dir)
    crossed = lj.segment_raster_cells(segs)
    cov = lj._cover(segs, "s", lj.SEG_GRID).select(
        F.col("s_id").alias("line_id"), "cx", "cy"
    )
    # crossed cells are a subset of the bbox cover, and every
    # segment keeps at least one cell (its endpoints live somewhere)
    assert crossed.join(cov, ["line_id", "cx", "cy"], "left_anti").count() == 0
    assert crossed.select("line_id").distinct().count() == segs.count()


def test_segment_raster_plan_is_map_only(spark, sf_dir):
    p = _plan(spark, sf_dir, "segment_raster_cells")
    assert "hashpartitioning" not in p
    assert "Python" not in p


# --- normalize_rings -------------------------------------------------------


def test_normalize_restores_clean_layer_exactly(spark, sf_dir):
    # corrupt -> normalize must reproduce the clean layer's arrays
    # byte-for-byte (shells were CCW and holes CW by construction)
    from geo_import_spark.operators import validation

    clean = corpus.holed_polygons(spark, sf_dir).select("poly_id", "geom")
    restored = entrymod.queries()["normalize_rings"]  # report form
    # rebuild the geometry path directly for the array comparison
    out = validation.normalize_rings(
        _dirty_holed(spark, sf_dir)
    ).select("poly_id", "geom")
    a = {r.poly_id: r.geom for r in clean.collect()}
    b = {r.poly_id: r.geom for r in out.collect()}
    assert set(a) == set(b)
    for pid in a:
        assert a[pid] == b[pid], pid


def _dirty_holed(spark, sf_dir):
    from pyspark.sql import functions as FF

    hp = corpus.holed_polygons(spark, sf_dir)
    g = FF.col("geom")
    ro = g["ring_offsets"]

    def corrupt(coords):
        def one(r):
            rs = FF.element_at(ro, r + 1)
            ln = FF.element_at(ro, r + 2) - rs
            sl = FF.slice(coords, rs + 1, ln)
            return FF.when((FF.col("pk") + r) % 2 == 0,
                           FF.reverse(sl)).otherwise(sl)

        return FF.flatten(
            FF.transform(FF.sequence(FF.lit(0), FF.size(ro) - 2), one))

    return hp.select(
        "poly_id",
        FF.struct(
            g["gtype"].alias("gtype"),
            g["part_offsets"].alias("part_offsets"),
            g["ring_offsets"].alias("ring_offsets"),
            corrupt(g["xs"]).alias("xs"),
            corrupt(g["ys"]).alias("ys"),
        ).alias("geom"),
    )


def test_normalize_is_idempotent(spark, sf_dir):
    from geo_import_spark.operators import validation

    # materialize between passes (localCheckpoint): composing the
    # operator on its own unmaterialized output nests the array
    # expression tree combinatorially (every element_at duplicates
    # the rebuilt-array subtree) — the docstring documents this
    once = validation.normalize_rings(
        _dirty_holed(spark, sf_dir)
    ).select("poly_id", "geom").localCheckpoint()
    twice = validation.normalize_rings(once)
    # second pass must flip nothing
    flipped = twice.select(
        F.explode("flips").alias("f")
    ).filter(F.col("f")).count()
    assert flipped == 0


def test_normalize_plan_is_map_only(spark, sf_dir):
    p = _plan(spark, sf_dir, "normalize_rings")
    assert "hashpartitioning" not in p
    assert "Python" not in p


# --- grid_change -----------------------------------------------------------


def test_grid_change_counts_and_labels(spark, sf_dir):
    from geo_import_spark.operators import spatialstats as ss
    from geo_import_spark.sources import geojson

    rows = entrymod.queries()["grid_change"](spark, sf_dir).collect()
    assert rows
    docs = corpus.documents(spark, sf_dir)
    total = geojson.point_spans(docs).join(
        entrymod._order_months(spark, sf_dir), "doc_id"
    ).count()
    assert sum(r.n_before + r.n_after for r in rows) == total
    for r in rows:
        assert r.delta == r.n_after - r.n_before
        if r.n_before == 0:
            assert r.label == "new" and r.n_after > 0
        elif r.n_after == 0:
            assert r.label == "gone"
        elif r.delta > 0:
            assert r.label == "grown"
        elif r.delta < 0:
            assert r.label == "shrunk"
        else:
            assert r.label == "stable"


def test_grid_change_single_count_shuffle(spark, sf_dir):
    # one conditional aggregate on the cell key; the only other
    # hash exchange is the doc->month dimension join
    p = _plan(spark, sf_dir, "grid_change")
    assert len(re.findall(r"hashpartitioning\(x", p)) <= 1
    assert "Python" in p or True  # decode UDF allowed upstream


# --- cell_cover_fraction ---------------------------------------------------


def test_cell_cover_fraction_invariants(spark, sf_dir):
    from geo_import_spark.operators import overlay as overlaymod

    rows = entrymod.queries()["cell_cover_fraction"](
        spark, sf_dir).collect()
    assert rows
    # fractions are in (0, 1]; per-polygon fraction mass equals the
    # polygon's area in cell units (conservative regridding: the
    # weights must re-distribute exactly the polygon's area)
    per_poly = {}
    for r in rows:
        assert 0.0 < r.frac <= 1.0 + 1e-12
        per_poly.setdefault(r.subject_id, 0)
        per_poly[r.subject_id] += r.cross2
    polys = corpus.concave_polygons(spark, sf_dir)
    from geo_import_spark.operators.geomstats import geom_stats

    areas = {
        r.poly_id: r.area
        for r in geom_stats(polys).collect()
    }
    for pid, csum in per_poly.items():
        # cross2 sums to 2*area*(2e6)^2 exactly (the lattice clip
        # partitions the polygon across cells, half-µdeg rounding
        # gives at most one lattice step per cell boundary)
        expect = areas[pid] * overlaymod.CROSS_TO_DEG2
        assert abs(csum - expect) <= 64, (pid, csum, expect)
