"""Offline CUSUM changepoint: planted mean-shift semantics, exact
statistic values, tie-breaking, and the series-length guard. Corpus
hash parity with SQL_CUSUM_CHANGEPOINT runs in test_oracle_parity.py
(`cusum_changepoint`)."""

from datetime import datetime, timedelta

from geo_import_spark.operators import timeseries

T0 = datetime(2024, 1, 1)
US = 1_000_000


def _events(spark, values, user=1):
    rows = [
        (user, T0 + timedelta(seconds=i), i, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_step_change_found_at_step(spark):
    # 5 zeros then 5 hundreds: the mean shifts after index 5
    r = _one(timeseries.cusum_changepoint(_events(spark, [0.0] * 5 + [100.0] * 5)))
    assert r["n"] == 10
    assert r["cp_i"] == 5
    # D_5 = n*cum_5 - 5*tot = 10*0 - 5*(5*100e6) = -2.5e9 -> abs
    assert r["max_dev"] == 2_500_000_000
    # cp_ts is the 5th point's timestamp (i is 1-based)
    assert r["cp_ts_us"] == int((T0 + timedelta(seconds=4)).timestamp() * US)


def test_constant_series_dev_zero_cp_first(spark):
    r = _one(timeseries.cusum_changepoint(_events(spark, [7.0] * 6)))
    assert r["max_dev"] == 0
    assert r["cp_i"] == 1  # tie-break: smallest index


def test_tie_breaks_to_smallest_index(spark):
    # alternating 0/100: |D| peaks equally at i=1 and i=3 -> cp_i = 1
    r = _one(timeseries.cusum_changepoint(_events(spark, [0.0, 100.0, 0.0, 100.0])))
    assert r["max_dev"] == 200_000_000
    assert r["cp_i"] == 1


def test_long_series_guard_drops(spark, monkeypatch):
    monkeypatch.setattr(timeseries, "CUSUM_MAX_N", 2)
    df = timeseries.cusum_changepoint(_events(spark, [1.0, 2.0, 3.0]))
    assert df.count() == 0


def test_two_users_independent(spark):
    a = _events(spark, [0.0] * 3 + [50.0] * 3, user=1)
    b = _events(spark, [9.0] * 4, user=2)
    out = {
        r["user_id"]: r
        for r in timeseries.cusum_changepoint(a.unionAll(b)).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["cp_i"] == 3
    assert out[2]["max_dev"] == 0
