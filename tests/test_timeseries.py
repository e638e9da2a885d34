"""Semantic tests for operators/timeseries.py: zero-filled gaps and
exact interpolation values on hand-built series."""

import datetime as dt

from geo_import_spark.operators import timeseries as ts


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts, value)
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double",
    )


def test_gap_fill_zero_hours(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    e = _events(spark, [
        (1, 1, "click", t0, 1.0),
        (2, 1, "click", t0 + dt.timedelta(hours=3), 1.0),
        (3, 1, "view", t0 + dt.timedelta(hours=1), 1.0),
    ])
    got = {(r.event_type, r.hour_id): r.n
           for r in ts.gap_fill_hourly(e).collect()}
    h0 = min(h for (_, h) in got)
    # global range is 4 hours (h0..h0+3) for BOTH types
    assert len(got) == 8
    assert got[("click", h0)] == 1 and got[("click", h0 + 3)] == 1
    assert got[("click", h0 + 1)] == 0 and got[("click", h0 + 2)] == 0
    assert got[("view", h0 + 1)] == 1 and got[("view", h0)] == 0


def test_resample_linear_exact_values(spark):
    step = ts.RESAMPLE_STEP_US
    base = dt.datetime(2024, 1, 1, 0, 0)  # epoch-aligned midnight
    # events at t=3h (v=10) and t=15h (v=22): grid points 6h and 12h
    # -> 10 + 12*(3/12)=13 and 10 + 12*(9/12)=19
    e = _events(spark, [
        (1, 1, "m", base + dt.timedelta(hours=3), 10.0),
        (2, 1, "m", base + dt.timedelta(hours=15), 22.0),
    ])
    got = sorted((r.grid_us, r.v_interp)
                 for r in ts.resample_linear(e).collect())
    assert len(got) == 2
    (g1, v1), (g2, v2) = got
    assert g2 - g1 == step
    assert v1 == 13_000_000.0 and v2 == 19_000_000.0


def test_resample_grid_point_on_event(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    # second event exactly ON the 6h grid -> interpolated value at
    # that grid instant equals the event value (right-closed interval)
    e = _events(spark, [
        (1, 1, "m", base + dt.timedelta(hours=1), 5.0),
        (2, 1, "m", base + dt.timedelta(hours=6), 8.0),
    ])
    got = [(r.grid_us, r.v_interp) for r in ts.resample_linear(e).collect()]
    assert len(got) == 1
    assert got[0][1] == 8_000_000.0


def test_resample_skips_empty_intervals_and_ties(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    e = _events(spark, [
        # tie pair (same timestamp) then a normal pair spanning 6h
        (1, 1, "m", base + dt.timedelta(hours=5), 1.0),
        (2, 1, "m", base + dt.timedelta(hours=5), 2.0),
        (3, 1, "m", base + dt.timedelta(hours=7), 3.0),
    ])
    got = [(r.grid_us, r.v_interp) for r in ts.resample_linear(e).collect()]
    # one grid point (6h), interpolated from the tie-surviving pair
    # (t=5h,v=2) -> (t=7h,v=3): v(6h) = 2.5
    assert len(got) == 1
    assert got[0][1] == 2_500_000.0


# --- time-weighted average + OHLC bars ---------------------------------------


def _us(ts):
    """Exact epoch microseconds of a naive (UTC-pinned) datetime —
    .timestamp()*1e6 is float and can be off by 1 us."""
    return (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)


def test_time_weighted_avg_matches_python(spark, sf_dir):
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = [
        (r["user_id"], _us(r["ts"]), r["event_id"],
         math.floor(float(r["value"]) * 1_000_000))
        for r in ev.collect()
    ]
    tracks = {}
    for u, us, eid, v in rows:
        tracks.setdefault(u, []).append((us, eid, v))
    exp = {}
    for u, tr in tracks.items():
        tr.sort()
        span = tr[-1][0] - tr[0][0]
        wsum = sum(
            v * (b[0] - us) for (us, _, v), b in zip(tr, tr[1:])
        )
        exp[u] = (len(tr), span,
                  float(wsum) / float(span) if span > 0 else None)
    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twa_micro"])
        for r in ts.time_weighted_avg(ev).collect()
    }
    assert got == exp


def test_twa_bounded_by_min_max_value(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pyspark.sql.functions as F

    lo, hi = ev.agg(
        F.floor(F.min("value") * 1e6), F.floor(F.max("value") * 1e6)
    ).collect()[0]
    for r in ts.time_weighted_avg(ev).collect():
        if r["twa_micro"] is not None:
            assert lo <= r["twa_micro"] <= hi


def test_ohlc_invariants_and_python_mirror(spark, sf_dir):
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    groups = {}
    for r in ev.collect():
        us = _us(r["ts"])
        v = math.floor(float(r["value"]) * 1_000_000)
        key = (r["event_type"], us // ts.US_PER_HOUR)
        groups.setdefault(key, []).append((us, r["event_id"], v))
    exp = {}
    for key, g in groups.items():
        g.sort()
        exp[key] = (g[0][2], max(v for _, _, v in g),
                    min(v for _, _, v in g), g[-1][2], len(g))
    got = {
        (r["event_type"], r["hour_id"]): (
            r["open_mi"], r["high_mi"], r["low_mi"], r["close_mi"], r["n"]
        )
        for r in ts.ohlc_bars(ev).collect()
    }
    assert got == exp
    for o, h, l, c, n in got.values():
        assert l <= o <= h and l <= c <= h and n >= 1
