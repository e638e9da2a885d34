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


# --- robust statistics: weighted median, Theil-Sen --------------------------


def test_weighted_median_matches_python(spark, sf_dir):
    import math

    from geo_import_spark.operators import statistics as st

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = [
        (r["l_returnflag"],
         math.floor(float(r["l_extendedprice"]) * 100 + 0.5),
         int(r["l_quantity"]))
        for r in li.collect()
    ]
    groups = {}
    for flag, pc, q in rows:
        groups.setdefault(flag, []).append((pc, q))
    exp = {}
    for flag, vals in groups.items():
        vals.sort()
        tot = sum(w for _, w in vals)
        cum = 0
        for pc, w in vals:
            cum += w
            if 2 * cum >= tot:
                exp[flag] = pc
                break
    got = {
        r["flag"]: r["w_median_c"]
        for r in st.weighted_median(li).collect()
    }
    assert got == exp


def test_theil_sen_matches_python(spark, sf_dir):
    import datetime as dt
    import math

    from geo_import_spark.operators import statistics as st

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    epoch = dt.date(1992, 1, 1)
    tracks = {}
    for r in orders.collect():
        od = r["o_orderdate"]
        if isinstance(od, dt.datetime):
            od = od.date()
        d = (od - epoch).days
        p = math.floor(float(r["o_totalprice"]) * 100 + 0.5)
        tracks.setdefault(r["o_custkey"], []).append((r["o_orderkey"], d, p))
    exp = {}
    for cust, pts in tracks.items():
        pts.sort()
        slopes = [
            (b[2] - a[2]) / (b[1] - a[1])
            for i, a in enumerate(pts)
            for b in pts[i + 1:]
            if a[1] != b[1]
        ]
        if not slopes:
            continue
        slopes.sort()
        m = len(slopes)
        exp[cust] = (m, slopes[(m + 1) // 2 - 1])
    got = {
        r["cust"]: (r["n_pairs"], r["sen_slope"])
        for r in st.theil_sen(orders).collect()
    }
    assert got == exp
    assert got


def test_theil_sen_hot_group_capped(spark):
    """VERDICT r4 #4: a power-law customer above max_group must get a
    deterministic capped verdict (NULL n_pairs/sen_slope) and never
    enter the pairwise join; small groups are computed exactly."""
    import datetime as dt

    rows = []
    epoch = dt.date(1995, 1, 1)
    for i in range(40):  # hot customer: 40 orders -> 780 would-be pairs
        rows.append((1000 + i, 7, epoch + dt.timedelta(days=i), 100.0 + i))
    small_pts = [(0, 100.00), (3, 103.30), (7, 101.40), (10, 110.00)]
    for j, (d, p) in enumerate(small_pts):
        rows.append((2000 + j, 8, epoch + dt.timedelta(days=d), p))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, "
              "o_totalprice double",
    )
    out = {r["cust"]: r for r in st.theil_sen(orders, max_group=10).collect()}
    assert set(out) == {7, 8}
    assert out[7]["n_pairs"] is None and out[7]["sen_slope"] is None
    # brute-force lower median for the small group (cents/day)
    pts = [(2000 + j, d, round(p * 100)) for j, (d, p) in enumerate(small_pts)]
    slopes = sorted(
        (b[2] - a[2]) / (b[1] - a[1])
        for i, a in enumerate(pts) for b in pts[i + 1:] if a[1] != b[1]
    )
    assert out[8]["n_pairs"] == len(slopes) == 6
    assert out[8]["sen_slope"] == slopes[(len(slopes) + 1) // 2 - 1]
