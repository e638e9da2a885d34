"""Semantic tests for the temporal operators (operators/temporal.py)
and the KMV sketch (trainprep.kmv_distinct) on crafted event streams —
oracle parity covers the sf corpus; these pin tie/boundary semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from geo_import_spark.operators import temporal, trainprep

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, s), u, t, v) for i, s, u, t, v in rows],
        EV_SCHEMA,
    )


def test_asof_join_picks_latest_at_or_before(spark):
    rows = [
        # (event_id, second, user, type, value)
        (0, 10, 1, "click", 0.0),
        (1, 20, 1, "click", 0.0),
        (2, 20, 1, "purchase", 0.0),   # tie: click@20 matches (inclusive)
        (3, 30, 1, "purchase", 0.0),   # latest click <= 30 is id=1 @20
        (4, 5, 2, "purchase", 0.0),    # user 2 has no click before -> dropped
        (5, 50, 2, "click", 0.0),
    ]
    got = {r.event_id: r for r in temporal.asof_join(_ev(spark, rows)).collect()}
    assert set(got) == {2, 3}
    assert got[2].matched_event_id == 1 and got[2].lag_us == 0
    assert got[3].matched_event_id == 1 and got[3].lag_us == 10_000_000


def test_asof_join_tie_on_equal_ts_prefers_larger_right_id(spark):
    rows = [
        (0, 10, 1, "click", 0.0),
        (7, 10, 1, "click", 0.0),   # same ts as id=0 -> larger id wins
        (9, 10, 1, "purchase", 0.0),
    ]
    got = temporal.asof_join(_ev(spark, rows)).collect()
    assert len(got) == 1 and got[0].matched_event_id == 7


def test_range_join_includes_boundary_and_spans_buckets(spark):
    # radius 30 s; bucket width = 30 s, so a pair 29 s apart can
    # straddle a bucket edge — the 3-bucket explode must find it.
    rows = [
        (0, 1, 1, "error", 0.0),
        (1, 31, 1, "click", 0.0),   # +30s: exactly on the boundary -> kept
        (2, 32, 1, "click", 0.0),   # +31s: outside
        (3, 29, 1, "click", 0.0),   # bucket 0 vs error bucket 0
        (4, 40, 2, "error", 0.0),   # other user: no pairs
    ]
    got = temporal.range_join(_ev(spark, rows), radius_s=30).collect()
    pairs = {(r.a_event_id, r.b_event_id, r.diff_us) for r in got}
    assert pairs == {(0, 1, -30_000_000), (0, 3, -28_000_000)}


def test_range_join_never_duplicates_pairs(spark):
    rows = [(0, 10, 1, "error", 0.0), (1, 11, 1, "click", 0.0)]
    got = temporal.range_join(_ev(spark, rows), radius_s=600).collect()
    assert len(got) == 1  # matched in exactly one bucket despite the explode


def test_rollup_multires_buckets_each_resolution(spark):
    rows = [
        (0, 10, 1, "view", 1.5),
        (1, 20, 1, "view", 2.25),
    ]
    got = temporal.rollup_multires(_ev(spark, rows), resolutions_s=(60, 3600))
    rowsd = {(r.res_s, r.bucket_start_us): r for r in got.collect()}
    base = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert rowsd[(60, base)].n == 2
    assert rowsd[(60, base)].total_micros == 1_500_000 + 2_250_000
    assert rowsd[(3600, base)].n == 2


def test_kmv_sketch_is_kth_min_of_distinct_hashes(spark):
    import hashlib

    vocab = [f"tok{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [(i, " ".join(vocab), "en", "s") for i in range(3)],  # dups across docs
        "doc_id long, text string, lang string, source string",
    )
    got = trainprep.kmv_distinct(docs, k=8).collect()
    assert len(got) == 1
    hashes = sorted(int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in vocab)
    r = got[0]
    assert r.kth_min_hash == hashes[7]
    assert r.exact_distinct == 40
    assert r.est_distinct == 7 * float(1 << 28) / hashes[7]


def test_group_quantiles_picks_order_statistics(spark):
    # 5 views with micro-values 1..5 -> p50 rank floor(4*.5)+1 = 3,
    # p90 rank floor(4*.9)+1 = 4, p99 rank 4
    rows = [(i, i + 1, 1, "view", (i + 1) / 1e6) for i in range(5)]
    got = temporal.group_quantiles(_ev(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.q50_micros, r.q90_micros, r.q99_micros) == (5, 3, 4, 4)


# --- sliding windows ---------------------------------------------------------

def test_sliding_counts_fanout_and_membership(spark, sf_dir):
    """Every event lands in exactly width/slide = 4 windows, and each
    window's count equals the brute-force count of events whose ts
    falls in [start, start + width)."""
    from geo_import_spark.streaming import events as eventsmod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = eventsmod.sliding_counts(ev).cache()  # derived frame, unpersisted below
    assert (
        out.agg(F.sum("n")).collect()[0][0] == 4 * ev.count()
    )
    # spot-check 5 windows against a direct interval count
    for r in out.orderBy("event_type", "win_start").limit(5).collect():
        direct = ev.filter(
            (F.col("event_type") == r["event_type"])
            & (F.col("ts") >= r["win_start"])
            & (F.col("ts") < F.lit(r["win_start"]) + F.expr("INTERVAL 1 HOUR"))
        ).count()
        assert direct == r["n"], r
    out.unpersist()


def test_sliding_counts_starts_are_slide_aligned(spark, sf_dir):
    from geo_import_spark.streaming import events as eventsmod

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bad = (
        eventsmod.sliding_counts(ev)
        .filter(F.expr("minute(win_start) % 15 != 0 OR second(win_start) != 0"))
        .count()
    )
    assert bad == 0


# --- sessionize_native (built-in session_window twin) ------------------------------

def test_native_sessions_boundary_semantics(spark):
    """gap == limit: the native window end is INCLUSIVE, so the
    boundary event merges — identical to the custom > rule."""
    import datetime as dt

    from geo_import_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),       # exactly at the gap
        (1, t0 + dt.timedelta(minutes=45)),
        (2, t0),
        (2, t0 + dt.timedelta(minutes=29, seconds=59)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    native = ev.sessionize_native(df, gap_minutes=30).collect()
    custom = ev.sessionize(df, gap_minutes=30).collect()
    n_native = sorted((r["user_id"], r["n_events"]) for r in native)
    n_custom = sorted((r["user_id"], r["n_events"]) for r in custom)
    assert n_native == [(1, 3), (2, 2)]  # boundary event merges
    assert n_custom == n_native


def test_native_sessions_equal_custom_on_corpus(spark, sf_dir):
    """The built-in session_window aggregate reproduces the two-window
    custom plan exactly on the event corpus."""
    from geo_import_spark.streaming import events as ev

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    native = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ev.sessionize_native(raw).collect()
    }
    custom = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ev.sessionize(raw).collect()
    }
    assert native == custom
