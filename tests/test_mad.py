"""MAD outliers: planted lower-median/MAD values, fence counting, and
the events-scanned-once plan shape. Corpus hash parity runs in
test_oracle_parity.py (`mad_outliers`)."""

from datetime import datetime, timedelta

from geo_import_spark.operators import statistics

T0 = datetime(2024, 1, 1)


def _events(spark, values, etype="a"):
    rows = [
        (i, T0 + timedelta(seconds=i), i % 3, etype, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_planted_median_and_mad(spark):
    # values 1..7 plus a wild 100: lower median of 8 values = 4,
    # deviations |v-4| = [3,2,1,0,1,2,3,96] -> lower MAD = 2,
    # fence 3*MAD = 6 -> only the 100 (dev 96) is outside
    r = _one(
        statistics.mad_outliers(
            _events(spark, [1, 2, 3, 4, 5, 6, 7, 100])
        )
    )
    assert r["med_u"] == 4_000_000
    assert r["mad_u"] == 2_000_000
    assert (r["n"], r["n_outliers"]) == (8, 1)


def test_constant_series_zero_mad_all_in(spark):
    # constant values: MAD = 0; dev > 0 counts as outlier only if
    # dev > 3*0 = 0 -> none (all devs are exactly 0)
    r = _one(statistics.mad_outliers(_events(spark, [5.0] * 6)))
    assert (r["med_u"], r["mad_u"], r["n_outliers"]) == (5_000_000, 0, 0)


def test_lower_median_even_count(spark):
    # [1, 2]: lower median is 1 (2*cum >= tot first at v=1)
    r = _one(statistics.mad_outliers(_events(spark, [1.0, 2.0])))
    assert r["med_u"] == 1_000_000


def test_types_independent(spark):
    a = _events(spark, [1, 2, 3], etype="a")
    b = _events(spark, [10, 10, 10], etype="b")
    out = {
        r["event_type"]: r
        for r in statistics.mad_outliers(a.unionAll(b)).collect()
    }
    assert out["a"]["med_u"] == 2_000_000
    assert out["b"]["mad_u"] == 0


def test_events_scanned_once_in_plan(spark, sf_dir):
    df = statistics.mad_outliers(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    df.count()  # materialize the histogram pin
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0
