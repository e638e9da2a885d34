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
