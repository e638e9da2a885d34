"""Trajectory stats: pure-Python mirror, triangle-inequality and
straightness invariants, single-shuffle plan."""

import math

from pyspark.sql import functions as F

from geo_import_spark.operators import trajectory


def test_matches_python_mirror(spark, sf_dir):
    pts = trajectory.order_points_u(spark, sf_dir)
    rows = sorted(
        ((r["cust"], r["seq"], r["x"], r["y"]) for r in pts.collect())
    )
    tracks = {}
    for cust, seq, x, y in rows:
        tracks.setdefault(cust, []).append((seq, x, y))
    exp = {}
    for cust, tr in tracks.items():
        tr.sort()
        path = sum(
            math.floor(
                math.sqrt(float((b[1] - a[1]) ** 2 + (b[2] - a[2]) ** 2))
            )
            for a, b in zip(tr, tr[1:])
        )
        net = math.floor(
            math.sqrt(
                float((tr[-1][1] - tr[0][1]) ** 2 + (tr[-1][2] - tr[0][2]) ** 2)
            )
        )
        exp[cust] = (len(tr), path, net)
    got = {
        r["cust"]: (r["n_points"], r["path_len_u"], r["net_disp_u"])
        for r in trajectory.trajectory_stats(pts).collect()
    }
    assert got == exp


def test_straightness_invariants(spark, sf_dir):
    """net <= path + n_hops (floor slack per hop) and straightness in
    (0, 1] up to the same slack; straight 2-point tracks score ~1."""
    pts = trajectory.order_points_u(spark, sf_dir)
    for r in trajectory.trajectory_stats(pts).collect():
        if r["path_len_u"] > 0:
            assert r["net_disp_u"] <= r["path_len_u"] + r["n_points"]
            assert r["straightness"] is not None and r["straightness"] >= 0.0
        else:
            assert r["straightness"] is None


def test_single_exchange_plan(spark, sf_dir):
    """The lag window and the per-entity aggregate share one hash
    partitioning on cust (plus the test-only spread_scan round robin)."""
    plan = (
        trajectory.trajectory_stats(trajectory.order_points_u(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(cust") <= 1


# --- movement analytics: walk corpus, staypoints, OD matrix ---------------


def _collect_walk(spark, sf_dir):
    tracks = {}
    for r in trajectory.walk_points(spark, sf_dir).collect():
        tracks.setdefault(r["cust"], []).append((r["i"], r["x"], r["y"]))
    for tr in tracks.values():
        tr.sort()
    return tracks


def _python_stays(tracks, eps=trajectory.STAY_EPS_U,
                  min_n=trajectory.STAY_MIN_N):
    out = {}
    for cust, tr in tracks.items():
        runs, run = [], [tr[0]]
        for a, b in zip(tr, tr[1:]):
            if (b[1] - a[1]) ** 2 + (b[2] - a[2]) ** 2 > eps * eps:
                runs.append(run)
                run = [b]
            else:
                run.append(b)
        runs.append(run)
        out[cust] = [r for r in runs if len(r) >= min_n]
    return out


def test_staypoints_match_python_mirror(spark, sf_dir):
    tracks = _collect_walk(spark, sf_dir)
    exp = _python_stays(tracks)
    got = {}
    for r in trajectory.staypoints(
        trajectory.walk_points(spark, sf_dir)
    ).collect():
        got.setdefault(r["cust"], []).append(
            (r["start_i"], r["end_i"], r["n_pings"], r["ax"], r["ay"],
             r["cx"], r["cy"])
        )
    for cust in got:
        got[cust].sort()
    assert set(got) == {c for c, rs in exp.items() if rs}
    for cust, runs in exp.items():
        if not runs:
            continue
        want = []
        for run in runs:
            n = len(run)
            want.append((
                run[0][0], run[-1][0], n, run[0][1], run[0][2],
                sum(p[1] for p in run) / n, sum(p[2] for p in run) / n,
            ))
        assert got[cust] == want, cust


def test_staypoints_run_length_bounded_by_dwell(spark, sf_dir):
    """The walk dwells 5 pings per site and inter-site hops always
    break eps, so every staypoint has 4 or 5 pings."""
    rows = trajectory.staypoints(
        trajectory.walk_points(spark, sf_dir)
    ).collect()
    assert rows
    assert all(r["n_pings"] in (4, 5) for r in rows)


def test_od_trips_count_consecutive_stays(spark, sf_dir):
    stays = trajectory.staypoints(trajectory.walk_points(spark, sf_dir))
    per_cust = {
        r["cust"]: r["n"]
        for r in stays.groupBy("cust").agg(
            F.count("*").alias("n")
        ).collect()
    }
    want_trips = sum(n - 1 for n in per_cust.values() if n > 1)
    od = trajectory.od_matrix(stays).collect()
    assert sum(r["trips"] for r in od) == want_trips
    assert all(r["trips"] > 0 for r in od)


def test_staypoints_single_cust_exchange(spark, sf_dir):
    plan = (
        trajectory.staypoints(trajectory.walk_points(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(cust") <= 1
