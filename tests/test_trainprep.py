"""Semantic tests for the training-prep operators (trainprep.py) and
the polygon-overlay join (overlay.py) on hand-built micro-corpora —
the oracle parity test covers the sf-corpus hash equality; these pin
the intended behavior case by case."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import overlay, trainprep

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


# --- stratified sampling -----------------------------------------------------

def test_stratified_sample_matches_md5_rule(spark):
    rows = [(i, "t", "en" if i % 2 else "zh", "s") for i in range(200)]
    got = {
        r.doc_id: r.bucket
        for r in trainprep.stratified_sample(_docs(spark, rows)).collect()
    }
    for i in range(200):
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 100
        rate = trainprep.SAMPLE_RATES["en" if i % 2 else "zh"]
        if bucket < rate:
            assert got[i] == bucket, i
        else:
            assert i not in got, i


def test_stratified_sample_is_rehash_stable(spark):
    """Adding documents never flips existing keep decisions."""
    small = trainprep.stratified_sample(
        _docs(spark, [(i, "t", "en", "s") for i in range(50)])
    )
    big = trainprep.stratified_sample(
        _docs(spark, [(i, "t", "en", "s") for i in range(100)])
    )
    small_ids = {r.doc_id for r in small.collect()}
    big_ids = {r.doc_id for r in big.collect()}
    assert small_ids == {i for i in big_ids if i < 50}


# --- decontamination ---------------------------------------------------------

def test_decontaminate_flags_shared_5gram(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text, "en", "s"),                      # benchmark (0 % 97 == 0)
        (1, "alpha beta gamma delta epsilon QQQ", "en", "s"),  # shares 1 5-gram
        (2, "one two three four five six", "en", "s"),   # disjoint
        (3, bench_text, "en", "s"),                      # exact copy: shares both
    ]
    got = {r.doc_id: r.n_shared for r in
           trainprep.decontaminate(_docs(spark, rows)).collect()}
    assert got == {1: 1, 3: 2}  # bench doc itself excluded, disjoint absent


# --- tf-idf ------------------------------------------------------------------

def test_tfidf_rank_prefers_rare_terms(spark):
    rows = [
        (1, "common rare common", "en", "s"),
        (2, "common other", "en", "s"),
        (3, "common third", "en", "s"),
    ]
    got = trainprep.tfidf_top_terms(_docs(spark, rows), k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    # doc 1: 'common' tf=2 df=3 -> 2*3/3=2.0; 'rare' tf=1 df=1 -> 3.0
    assert d1[0].token == "rare" and d1[0].score == 3.0
    assert d1[1].token == "common" and d1[1].score == 2.0
    assert all(r.rank <= 2 for r in got)


# --- repetition stats --------------------------------------------------------

def test_repetition_stats_counts_top_bigram(spark):
    rows = [(1, "x y x y z", "en", "s"), (2, "solo", "en", "s")]
    got = {r.doc_id: r for r in
           trainprep.repetition_stats(_docs(spark, rows)).collect()}
    r1 = got[1]
    assert (r1.n_bigrams, r1.n_uniq_bigrams) == (4, 3)
    assert r1.top_bigram == "x y" and r1.top_bigram_n == 2
    assert r1.rep_ratio == 0.5
    r2 = got[2]  # < 2 tokens -> nulls
    assert r2.n_bigrams == 0 and r2.top_bigram is None and r2.rep_ratio is None


def test_repetition_stats_tie_breaks_on_min_bigram(spark):
    got = trainprep.repetition_stats(
        _docs(spark, [(1, "b a b a c d c d", "en", "s")])
    ).collect()[0]
    # 'a b', 'b a', 'c d' all appear... counts: b a=2? bigrams:
    # "b a","a b","b a","a c","c d","d c","c d" -> top n=2 for "b a","c d"
    assert got.top_bigram_n == 2
    assert got.top_bigram == "b a"  # min of the argmax set


# --- pii scan ----------------------------------------------------------------

def test_pii_scan_counts_and_redacts(spark):
    rows = [(9, "hello", "en", "s"), (4, "hi", "en", "s"), (1, "yo", "en", "s")]
    got = {r.doc_id: r for r in trainprep.pii_scan(_docs(spark, rows)).collect()}
    assert got[9].n_emails == 2 and got[9].first_email == "user9@example.com"
    assert got[9].n_urls == 0 and got[9].first_url is None
    assert got[4].n_emails == 0 and got[4].n_urls == 1
    assert got[4].first_url == "https://ex.com/d/4"
    assert got[1].n_emails == 0 and got[1].n_urls == 0
    # doc 1 has no injected PII: redaction is the identity
    assert got[1].redacted_hash == hashlib.md5(b"yo").hexdigest()
    # doc 4's URL is redacted before hashing
    assert got[4].redacted_hash == hashlib.md5(b"hi see <URL>").hexdigest()


def test_pii_scan_on_raw_text_extracts_organic_matches(spark):
    rows = [(7, "write to a.b@x.io or see https://x.io/a", "en", "s")]
    got = trainprep.pii_scan(_docs(spark, rows), text_col=F.col("text")).collect()[0]
    assert got.n_emails == 1 and got.first_email == "a.b@x.io"
    assert got.n_urls == 1 and got.first_url == "https://x.io/a"


# --- sequence packing --------------------------------------------------------

def test_pack_sequences_bins_by_cumulative_budget(spark):
    text40 = " ".join(["w"] * 40)
    rows = [(i, text40, "en", "srcA") for i in range(3)] + [
        (10, " ".join(["w"] * 10), "en", "srcB")
    ]
    got = {(r.doc_id): r.seq_id for r in
           trainprep.pack_sequences(_docs(spark, rows), budget=64).collect()}
    # srcA cumulative starts: 0, 40, 80 -> bins 0, 0, 1; srcB restarts at 0
    assert got == {0: 0, 1: 0, 2: 1, 10: 0}


# --- overlay join ------------------------------------------------------------

def _clips(spark, rows):
    return spark.createDataFrame(
        rows, "poly_id string, minx double, miny double, maxx double, maxy double"
    )


def _subjects(spark, rows):
    """rows: (poly_id, ring_offsets, xs, ys)"""
    df = spark.createDataFrame(
        rows,
        "poly_id string, ring_offsets array<int>, xs array<double>, ys array<double>",
    )
    return df.select(
        "poly_id",
        F.struct(
            F.col("ring_offsets").alias("ring_offsets"),
            F.col("xs").alias("xs"),
            F.col("ys").alias("ys"),
        ).alias("geom"),
    )


def test_overlay_rect_vs_L_matches_decomposition(spark):
    # L: lower slab [0,10]x[0,4] + upper-left block [0,5]x[4,8]
    lx = [0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 0.0]
    ly = [0.0, 0.0, 4.0, 4.0, 8.0, 8.0, 0.0]
    subs = _subjects(spark, [("L", [0, 7], lx, ly)])
    clips = _clips(
        spark,
        [
            ("full", -1.0, -1.0, 11.0, 9.0),   # covers all of L: area 10*4+5*4=60
            ("notch", 6.0, 5.0, 9.0, 7.0),     # entirely in the notch: no hit
            ("slab", 2.0, 1.0, 8.0, 3.0),      # inside lower slab: 6*2=12
            ("cross", 4.0, 3.0, 7.0, 6.0),     # spans slab+block: 3*1 + 1*2 = 5
            ("afar", 100.0, 20.0, 110.0, 30.0),
        ],
    )
    got = {r.clip_id: r for r in overlay.overlay_join(clips, subs).collect()}
    areas = {k: v.area_deg2 for k, v in got.items()}
    assert areas == {"full": 60.0, "slab": 12.0, "cross": 5.0}
    assert got["full"].cross2 == int(2 * 60.0 * 4e12)


def test_overlay_disconnected_intersection_sums_pieces(spark):
    # U-shaped subject: two vertical arms [0,2]x[0,10] and [8,10]x[0,10]
    # joined by base [0,10]x[0,2]; a wide clip strip across y in [5,7]
    # intersects BOTH arms but not the gap -> area 2*2 + 2*2 = 8.
    ux = [0.0, 10.0, 10.0, 8.0, 8.0, 2.0, 2.0, 0.0, 0.0]
    uy = [0.0, 0.0, 10.0, 10.0, 2.0, 2.0, 10.0, 10.0, 0.0]
    subs = _subjects(spark, [("U", [0, 9], ux, uy)])
    clips = _clips(spark, [("strip", -1.0, 5.0, 11.0, 7.0)])
    got = overlay.overlay_join(clips, subs).collect()
    assert len(got) == 1 and got[0].area_deg2 == 8.0


def test_overlay_hole_subtracts(spark):
    # 10x10 square with a 4x4 hole (CW inner ring) -> clip full: 84
    xs = [0.0, 10.0, 10.0, 0.0, 0.0] + [3.0, 3.0, 7.0, 7.0, 3.0]
    ys = [0.0, 0.0, 10.0, 10.0, 0.0] + [3.0, 7.0, 7.0, 3.0, 3.0]
    subs = _subjects(spark, [("holed", [0, 5, 10], xs, ys)])
    clips = _clips(spark, [("full", -1.0, -1.0, 11.0, 11.0)])
    got = overlay.overlay_join(clips, subs).collect()
    assert len(got) == 1 and got[0].area_deg2 == 84.0


def test_overlay_triangle_close_to_true_area(spark):
    # Non-rectilinear subject: right triangle (0,0)-(8,0)-(0,8),
    # clipped by [0,6]x[0,6]: square minus the corner triangle cut by
    # the hypotenuse x+y=8 (legs 4) -> 36 - 8 = 28.
    subs = _subjects(
        spark, [("tri", [0, 4], [0.0, 8.0, 0.0, 0.0], [0.0, 0.0, 8.0, 0.0])]
    )
    clips = _clips(spark, [("c", 0.0, 0.0, 6.0, 6.0)])
    got = overlay.overlay_join(clips, subs).collect()
    assert len(got) == 1
    assert got[0].area_deg2 == pytest.approx(28.0, rel=1e-9)


def test_overlay_randomized_rectilinear_matches_interval_math(spark):
    rng = np.random.default_rng(7)
    clips_rows, true = [], {}
    # subject: the same L as above, on the half-micro lattice w/ eps
    eps = 4.5e-7
    lx = [v + eps for v in [0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 0.0]]
    ly = [v + eps for v in [0.0, 0.0, 4.0, 4.0, 8.0, 8.0, 0.0]]
    subs = _subjects(spark, [("L", [0, 7], lx, ly)])
    for i in range(40):
        x0, y0 = rng.integers(-4, 10, 2)
        w, h = rng.integers(1, 9, 2)
        c = (x0 + 0.5 + eps, y0 + 0.5 + eps, x0 + 0.5 + w + eps, y0 + 0.5 + h + eps)
        clips_rows.append((f"c{i}", *[float(v) for v in c]))
        a = 0
        for sx0, sy0, sx1, sy1 in ((0, 0, 10, 4), (0, 4, 5, 8)):
            wu = max(0, min(c[2] - eps, sx1) - max(c[0] - eps, sx0))
            hu = max(0, min(c[3] - eps, sy1) - max(c[1] - eps, sy0))
            a += round(wu * 2e6) * round(hu * 2e6)
        if a > 0:
            true[f"c{i}"] = 2 * a
    got = {r.clip_id: r.cross2 for r in
           overlay.overlay_join(_clips(spark, clips_rows), subs).collect()}
    assert got == true


# --- density contours (raster -> vector) --------------------------------------

def test_density_contours_merges_adjacent_runs(spark):
    from geo_import_spark.operators import tiling

    # level 2 -> 4x4 grid: 90-degree lon cells, 45-degree lat cells.
    # Row y=1 (lat 0..45): dense cells x=0,1 (adjacent -> one run) and
    # x=3 (second run); x=2 kept sparse (below threshold).
    def pts(cx, cy, n):
        lon = -180.0 + cx * 90.0 + 10.0
        lat = 90.0 - cy * 45.0 - 10.0
        return [(f"d{cx}-{cy}-{i}", lon + i * 0.001, lat) for i in range(n)]

    rows = pts(0, 1, 5) + pts(1, 1, 4) + pts(2, 1, 2) + pts(3, 1, 6)
    df = spark.createDataFrame(rows, "doc_id string, lon double, lat double")
    got = sorted(
        tiling.density_contours(df, level=2, min_points=4).collect(),
        key=lambda r: r.x0,
    )
    assert [(r.y, r.x0, r.x1, r.n_cells, r.n_points) for r in got] == [
        (1, 0, 1, 2, 9),
        (1, 3, 3, 1, 6),
    ]
    assert got[0].lon_min == -180.0 and got[0].lon_max == 0.0
    assert got[0].lat_min == 0.0 and got[0].lat_max == 45.0
