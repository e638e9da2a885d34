"""SCD2 history build: planted change-log semantics (run collapse,
versioning, validity chaining, is_current) and the single-Exchange
plan shape. Corpus hash parity runs in test_oracle_parity.py
(`scd2_history`)."""

from datetime import datetime, timedelta

from geo_import_spark.operators import scd

T0 = datetime(2024, 1, 1)
US = 1_000_000


def _log(spark, rows):
    # rows: (user, second-offset, state)
    data = [
        (u, T0 + timedelta(seconds=s), i, st, 0.0)
        for i, (u, s, st) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double",
    )


def _hist(df):
    return [
        (r["state"], r["version"], r["valid_to_us"] is None)
        for r in df.orderBy("user_id", "version").collect()
    ]


def test_runs_collapse_and_version(spark):
    h = scd.scd2_history(
        _log(spark, [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "a")])
    )
    assert _hist(h) == [("a", 1, False), ("b", 2, False), ("a", 3, True)]


def test_validity_intervals_chain(spark):
    h = scd.scd2_history(
        _log(spark, [(1, 0, "x"), (1, 5, "y"), (1, 9, "z")])
    ).orderBy("version").collect()
    # exclusive valid_to of each row equals the next row's valid_from
    assert h[0]["valid_to_us"] == h[1]["valid_from_us"]
    assert h[1]["valid_to_us"] == h[2]["valid_from_us"]
    assert h[2]["valid_to_us"] is None and h[2]["is_current"]
    assert h[1]["valid_from_us"] - h[0]["valid_from_us"] == 5 * US


def test_single_state_single_row(spark):
    h = scd.scd2_history(_log(spark, [(1, 0, "a"), (1, 1, "a")]))
    assert _hist(h) == [("a", 1, True)]


def test_users_independent(spark):
    h = scd.scd2_history(
        _log(spark, [(1, 0, "a"), (2, 0, "a"), (1, 1, "b"), (2, 1, "a")])
    )
    per_user = {}
    for r in h.collect():
        per_user.setdefault(r["user_id"], []).append(r["version"])
    assert sorted(per_user[1]) == [1, 2]
    assert sorted(per_user[2]) == [1]


def test_exactly_one_current_per_user(spark, sf_dir):
    h = scd.scd2_history(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).cache()
    try:
        users = h.select("user_id").distinct().count()
        currents = h.filter("is_current").count()
        assert users == currents > 0
    finally:
        h.unpersist()


def test_single_exchange_in_plan(spark, sf_dir):
    df = scd.scd2_history(spark.read.parquet(f"{sf_dir}/events.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both windows and the filter share one hash partitioning on user_id
    assert plan.count("Exchange hashpartitioning") == 1
