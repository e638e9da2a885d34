"""Emerging hotspots (Mann-Kendall per cell): planted monotone /
constant / short-series semantics and the dense zero-fill. Corpus
hash parity runs in test_oracle_parity.py (`emerging_hotspots`)."""

from geo_import_spark.operators import spatialstats

_W = 360.0 / 64
_H = 180.0 / 64


def _frames(spark, cell_month_counts):
    # cell_month_counts: {(gx, gy): {month: count}}
    pts, mons, doc = [], [], 0
    for (gx, gy), series in cell_month_counts.items():
        lon = -180.0 + (gx + 0.5) * _W
        lat = 90.0 - (gy + 0.5) * _H
        for month, n in series.items():
            for _ in range(n):
                pts.append((f"d{doc}", lon, lat))
                mons.append((f"d{doc}", month))
                doc += 1
    return (
        spark.createDataFrame(pts, "doc_id string, lon double, lat double"),
        spark.createDataFrame(mons, "doc_id string, month_id long"),
    )


def _out(spark, cmc):
    pts, mons = _frames(spark, cmc)
    return {
        (r["x"], r["y"]): r
        for r in spatialstats.emerging_hotspots(pts, mons).collect()
    }


def test_monotone_increase_is_inc(spark):
    # 5 months 1..5: S = 10 (all pairs rise); Var18 = 5*4*15 = 300,
    # S^2*18e4 = 1.8e7 > 38416*300 = 1.15e7 -> significant
    out = _out(spark, {(10, 10): {m: m + 1 for m in range(5)}})
    r = out[(10, 10)]
    assert (r["n_months"], r["s"], r["label"]) == (5, 10, "inc")


def test_monotone_decrease_is_dec(spark):
    out = _out(spark, {(10, 10): {m: 5 - m for m in range(5)}})
    assert out[(10, 10)]["label"] == "dec"
    assert out[(10, 10)]["s"] == -10


def test_constant_series_flat(spark):
    out = _out(spark, {(10, 10): {m: 3 for m in range(5)}})
    r = out[(10, 10)]
    assert (r["s"], r["label"]) == (0, "flat")


def test_short_series_max_trend_insignificant(spark):
    # 3 months monotone: S = 3 but S^2*18e4 = 1.62e6 < 38416*3*2*11 =
    # 2.54e6 -> the max-possible trend is still 'flat' at n = 3
    out = _out(spark, {(10, 10): {0: 1, 1: 2, 2: 3}})
    r = out[(10, 10)]
    assert (r["s"], r["label"]) == (3, "flat")


def test_dense_zero_fill_uses_global_calendar(spark):
    # cell A spans months 0..4; cell B has hits only in month 4 —
    # its series is [0,0,0,0,n] via the GLOBAL range, so S = 4
    out = _out(
        spark,
        {(10, 10): {m: 1 for m in range(5)}, (20, 20): {4: 7}},
    )
    b = out[(20, 20)]
    assert b["n_months"] == 5
    assert b["s"] == 4  # four rises from 0 to 7, ties elsewhere


def test_sources_not_rescanned_in_plan(spark, sf_dir):
    # the counts/dense pins keep the point+calendar sources out of
    # the final fragment (measured 10 scans before the pins)
    import __spark_entry__ as e

    df = e.queries()["emerging_hotspots"](spark, sf_dir)
    df.count()  # materialize the pins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0
