"""Trajectory similarity (discrete Fréchet + DTW): planted-input
semantics, degenerate shapes, and the track-length guard. Corpus
parity with the recursive-CTE DuckDB mirror runs in
test_oracle_parity.py (query `frechet_dtw`)."""

from geo_import_spark.operators import trajsim


def _walk(spark, rows):
    return spark.createDataFrame(rows, "cust long, i long, x long, y long")


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_identical_tracks_zero(spark):
    pts = [(0, 0, 0), (1, 10, 0), (2, 10, 10)]
    walk = _walk(
        spark,
        [(c, i, x, y) for c in (1, 2) for i, x, y in pts],
    )
    r = _one(trajsim.track_distances(walk))
    assert (r["ca"], r["cb"], r["frechet_u"], r["dtw_u"]) == (1, 2, 0, 0)


def test_parallel_offset_tracks(spark):
    # B is A shifted by (0, 3): every coupling step costs exactly 3
    # (Chebyshev), so Fréchet = 3 and DTW = 3 per diagonal step
    pts = [(0, 0, 0), (1, 10, 0), (2, 20, 0)]
    walk = _walk(
        spark,
        [(1, i, x, y) for i, x, y in pts]
        + [(2, i, x, y + 3) for i, x, y in pts],
    )
    r = _one(trajsim.track_distances(walk))
    assert r["frechet_u"] == 3
    assert r["dtw_u"] == 9  # 3 diagonal steps x cost 3


def test_single_point_vs_segment(spark):
    # A = [(0,0), (10,0)], B = [(5,5)]: both A points couple with the
    # lone B point at Chebyshev 5 -> Fréchet 5, DTW 5+5
    walk = _walk(spark, [(1, 0, 0, 0), (1, 1, 10, 0), (2, 0, 5, 5)])
    r = _one(trajsim.track_distances(walk))
    assert (r["frechet_u"], r["dtw_u"]) == (5, 10)


def test_frechet_waiting_coupling(spark):
    # unequal lengths force the coupling to WAIT: a3 pairs with both
    # b3 (cost 1) and the trailing b4 (cost 2), so Fréchet = 2 and
    # DTW = 1+1+1+2 — the dog stands still while the leash pays
    a = [(0, 0), (10, 0), (20, 0)]
    b = [(0, 1), (10, 1), (20, 1), (20, 2)]
    walk = _walk(
        spark,
        [(1, i, x, y) for i, (x, y) in enumerate(a)]
        + [(2, i, x, y) for i, (x, y) in enumerate(b)],
    )
    r = _one(trajsim.track_distances(walk))
    assert (r["frechet_u"], r["dtw_u"]) == (2, 5)


def test_dp_reference_values():
    # pin the pure DP against hand-checkable values
    f, d = trajsim._dp_distances([0, 10], [0, 0], [0, 10], [4, 4])
    assert (f, d) == (4, 8)
    f, d = trajsim._dp_distances([0], [0], [7], [24])
    assert (f, d) == (24, 24)


def test_max_track_guard_drops_long_tracks(spark):
    # a track longer than max_n never enters the DP: its pairs vanish
    long_track = [(1, i, i, 0) for i in range(6)]
    short = [(2, 0, 0, 0), (2, 1, 1, 1)]
    walk = _walk(spark, long_track + short)
    assert trajsim.track_distances(walk, max_n=4).count() == 0


def test_non_consecutive_custs_not_paired(spark):
    walk = _walk(spark, [(1, 0, 0, 0), (3, 0, 5, 5)])
    assert trajsim.track_distances(walk).count() == 0


def test_hausdorff_identical_zero(spark):
    pts = [(0, 0, 0), (1, 10, 0), (2, 10, 10)]
    walk = _walk(
        spark, [(c, i, x, y) for c in (1, 2) for i, x, y in pts]
    )
    r = _one(trajsim.hausdorff(walk))
    assert (r["h_ab_u"], r["h_ba_u"], r["hausdorff_u"]) == (0, 0, 0)


def test_hausdorff_asymmetric_directed(spark):
    # A = [(0,0)], B = [(0,0), (10,0)]: every A point has a B point at
    # distance 0 -> h(A,B)=0, but B's far point is 10 from all of A ->
    # h(B,A)=10; symmetric = 10. Fréchet on the same pair is also 10,
    # DTW 0+10 — Hausdorff = Fréchet here, and both bound from below.
    walk = _walk(spark, [(1, 0, 0, 0), (2, 0, 0, 0), (2, 1, 10, 0)])
    r = _one(trajsim.hausdorff(walk))
    assert (r["h_ab_u"], r["h_ba_u"], r["hausdorff_u"]) == (0, 10, 10)


def test_hausdorff_ignores_order(spark):
    # Hausdorff is a SET distance: reversing B changes Fréchet but not
    # Hausdorff. A straight, B reversed-straight with offset 2.
    a = [(0, 0), (10, 0), (20, 0)]
    b = [(20, 2), (10, 2), (0, 2)]
    walk = _walk(
        spark,
        [(1, i, x, y) for i, (x, y) in enumerate(a)]
        + [(2, i, x, y) for i, (x, y) in enumerate(b)],
    )
    rh = _one(trajsim.hausdorff(walk))
    assert rh["hausdorff_u"] == 2  # nearest-point match per point
    rf = _one(trajsim.track_distances(walk))
    assert rf["frechet_u"] == 20  # order-sensitive: ends must couple


def test_hausdorff_lower_bounds_frechet(spark, sf_dir):
    from geo_import_spark.operators import trajectory

    walk = trajectory.walk_points(spark, sf_dir)
    joined = (
        trajsim.hausdorff(walk)
        .join(trajsim.track_distances(walk), ["ca", "cb"])
        .select("hausdorff_u", "frechet_u")
        .collect()
    )
    assert len(joined) > 0
    assert all(r["hausdorff_u"] <= r["frechet_u"] for r in joined)


def test_hausdorff_plan_has_no_python_stage(spark, sf_dir):
    from geo_import_spark.operators import trajectory

    df = trajsim.hausdorff(trajectory.walk_points(spark, sf_dir))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_points_scanned_once_in_plan(spark, sf_dir):
    from geo_import_spark.operators import trajectory

    df = trajsim.track_distances(trajectory.walk_points(spark, sf_dir))
    df.count()  # materialize the localCheckpoint pin
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
