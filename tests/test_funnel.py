"""Semantic tests for operators/funnel.py on hand-built event frames:
strict funnel ordering, cohort-week offsets, the attribution window
boundary, and transition adjacency."""

import datetime as dt

from geo_import_spark.operators import funnel as fn


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts)
    return spark.createDataFrame(
        [(eid, uid, et, t, 0.0, "") for eid, uid, et, t in rows],
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark):
    e = _events(spark, [
        # user 1: full ordered funnel
        (1, 1, "view", _ts("2020-01-01T00:00:00")),
        (2, 1, "click", _ts("2020-01-01T01:00:00")),
        (3, 1, "purchase", _ts("2020-01-01T02:00:00")),
        # user 2: clicked BEFORE first view -> stalls at stage 1
        (4, 2, "click", _ts("2020-01-01T00:00:00")),
        (5, 2, "view", _ts("2020-01-01T01:00:00")),
        # user 3: view only
        (6, 3, "view", _ts("2020-01-01T00:00:00")),
        # user 4: never viewed -> reaches nothing
        (7, 4, "purchase", _ts("2020-01-01T00:00:00")),
    ])
    got = {r.stage: r.n_users for r in fn.funnel_counts(e).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_not_after(spark):
    # click at EXACTLY the view time is not "after" (strict >)
    e = _events(spark, [
        (1, 1, "view", _ts("2020-01-01T00:00:00")),
        (2, 1, "click", _ts("2020-01-01T00:00:00")),
    ])
    got = {r.stage: r.n_users for r in fn.funnel_counts(e).collect()}
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_retention_offsets(spark):
    # user 1 active in epoch-weeks W and W+2; user 2 only W
    base = _ts("2020-01-06T00:00:00")  # arbitrary anchor
    e = _events(spark, [
        (1, 1, "view", base),
        (2, 1, "view", base + dt.timedelta(weeks=2)),
        (3, 2, "view", base),
    ])
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in fn.retention_cohorts(e).collect()}
    w0 = next(k[0] for k in got)
    assert got == {(w0, 0): 2, (w0, 2): 1}


def test_attribution_window_edge(spark):
    day = dt.timedelta(days=1)
    t0 = _ts("2020-06-15T00:00:00")
    e = _events(spark, [
        # purchase A: touch exactly 7 days earlier -> inside (>= cutoff)
        (1, 1, "click", t0 - 7 * day),
        (2, 1, "purchase", t0),
        # purchase B: touch 7 days + 1 us earlier -> outside
        (3, 2, "view", t0 - 7 * day - dt.timedelta(microseconds=1)),
        (4, 2, "purchase", t0),
        # purchase C: no touch at all
        (5, 3, "purchase", t0),
        # purchase D: prior purchase is NOT a touch; earlier view is,
        # but it's the view 10 days back -> outside the window
        (6, 4, "view", t0 - 10 * day),
        (7, 4, "purchase", t0 - 9 * day),
        (8, 4, "purchase", t0),
    ])
    got = {r.touch_type: r.n_conversions
           for r in fn.last_touch_attribution(e).collect()}
    # purchases: A->click, B->(none), C->(none), D(first)->view(in window
    # for the t0-9d purchase: view at t0-10d is 1 day before it), D(second)->(none)
    assert got == {"click": 1, "view": 1, "(none)": 3}


def test_event_transitions_adjacency(spark):
    e = _events(spark, [
        (1, 1, "view", _ts("2020-01-01T00:00:00")),
        (2, 1, "click", _ts("2020-01-01T01:00:00")),
        (3, 1, "click", _ts("2020-01-01T02:00:00")),
        (4, 2, "view", _ts("2020-01-01T00:00:00")),
        # single-event user contributes no edge
        (5, 3, "error", _ts("2020-01-01T00:00:00")),
    ])
    got = {(r.prev_type, r.next_type): r.n
           for r in fn.event_transitions(e).collect()}
    assert got == {("view", "click"): 1, ("click", "click"): 1}
