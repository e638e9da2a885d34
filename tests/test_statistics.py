"""Semantic tests for operators/statistics.py: correlation/regression
against NumPy on known data, ntile tie-break determinism, and the
integer half-life decay."""

import datetime as dt

import numpy as np

from geo_import_spark.operators import statistics as st


def test_correlation_matches_numpy(spark):
    rng = np.random.RandomState(3)
    qty = rng.randint(1, 50, 300).astype(float)
    # price correlated with qty plus noise, on the cent lattice
    price = (qty * 101.5 + rng.normal(0, 40, 300)).round(2)
    li = spark.createDataFrame(
        [("A", float(q), float(p)) for q, p in zip(qty, price)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    row = st.qty_price_correlation(li).collect()[0]
    # engine scale: exact cents floor-divided to whole dollars
    dollars = np.floor(price * 100.0 + 0.5) // 100
    expect = np.corrcoef(qty, dollars)[0, 1]
    assert row.n == 300
    assert abs(row.r - expect) < 1e-9


def test_regression_matches_numpy(spark):
    qty = np.arange(1, 41, dtype=float)
    price = qty * 250.0 + 1000.0  # whole dollars: 250*q + 1000 exactly
    li = spark.createDataFrame(
        [("A", float(q), float(p)) for q, p in zip(qty, price)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    row = st.price_qty_regression(li).collect()[0]
    assert abs(row.slope - 250.0) < 1e-9
    assert abs(row.intercept - 1000.0) < 1e-9


def test_rfm_quartiles_partition_evenly(spark):
    n = 8
    cust = spark.createDataFrame(
        [(i, 0, 0.0) for i in range(n)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (i, i, float(100 * (i + 1)),
             dt.datetime(2001, 1, 1) + dt.timedelta(days=i))
            for i in range(n)
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    seg = st.rfm_segments(cust, orders).collect()
    assert sum(r.n_customers for r in seg) == n
    # every quartile label in range
    for r in seg:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
    # all frequencies equal -> f_q decided purely by the custkey
    # tie-break: 2 customers per f-quartile
    fcounts = {}
    for r in seg:
        fcounts[r.f_q] = fcounts.get(r.f_q, 0) + r.n_customers
    assert fcounts == {1: 2, 2: 2, 3: 2, 4: 2}


def test_decay_halves_per_halflife(spark):
    asof = dt.datetime.fromisoformat(st.DECAY_ASOF)
    h = st.DECAY_HALFLIFE_DAYS
    orders = spark.createDataFrame(
        [
            (1, 10, 80.0, asof - dt.timedelta(days=1)),        # k=0 -> 8000
            (2, 10, 80.0, asof - dt.timedelta(days=h + 1)),    # k=1 -> 4000
            (3, 10, 80.0, asof - dt.timedelta(days=2 * h + 1)),  # k=2 -> 2000
            (4, 11, 0.01, asof - dt.timedelta(days=h + 1)),    # 1c div 2 -> 0
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    got = {r.o_custkey: r.decayed_c
           for r in st.decayed_revenue(orders).collect()}
    assert got == {10: 8000 + 4000 + 2000, 11: 0}
