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
