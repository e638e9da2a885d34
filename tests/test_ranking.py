"""Semantic tests for operators/ranking.py: rank ties, pivot zeros,
and exact Pareto cumulative sums on hand-built frames."""

import datetime as dt

from geo_import_spark.operators import ranking as rk


def test_top_k_rank_ties_included(spark):
    cust = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "c_custkey long, c_nationkey int"
    )
    nation = spark.createDataFrame([(0, "N0")],
                                   "n_nationkey int, n_name string")
    # revenues: 100, 100, 100, 100, 50 — the custkey tie-break makes
    # the order TOTAL, so the four ties get distinct ranks 1..4 and
    # exactly k=3 rows survive, deterministically the lowest custkeys
    orders = spark.createDataFrame(
        [(i, i, 100.0 if i < 5 else 50.0, dt.datetime(2000, 1, 1))
         for i in range(1, 6)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    got = sorted(rk.top_customers_per_nation(cust, orders, nation).collect(),
                 key=lambda r: r.rnk)
    assert [(r.c_custkey, r.rnk) for r in got] == [(1, 1), (2, 2), (3, 3)]


def test_pivot_counts_and_zeros(spark):
    e = spark.createDataFrame(
        [(1, 7, "click"), (2, 7, "click"), (3, 7, "view"), (4, 8, "error")],
        "event_id long, user_id long, event_type string",
    )
    got = {r.user_id: r for r in rk.user_type_pivot(e).collect()}
    assert (got[7].n_click, got[7].n_view, got[7].n_purchase) == (2, 1, 0)
    assert (got[8].n_error, got[8].n_click) == (1, 0)


def test_pareto_cumulative_exact(spark):
    # 10 customers with revenue 10, 9, ..., 1 dollars -> one per decile
    orders = spark.createDataFrame(
        [(i, i, float(11 - i), dt.datetime(2000, 1, 1))
         for i in range(1, 11)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    rows = sorted(rk.revenue_pareto(orders).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert [r.rev_c for r in rows] == [c * 100 for c in range(10, 0, -1)]
    # cumulative column is the exact running total
    run = 0
    for r in rows:
        run += r.rev_c
        assert r.cum_rev_c == run
    assert rows[-1].cum_rev_c == 5500


def test_skyline_matches_bruteforce(spark, sf_dir):
    import math

    from geo_import_spark.operators import ranking

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rows = [
        (r["p_partkey"],
         math.floor(float(r["p_retailprice"]) * 100 + 0.5),
         int(r["p_size"]))
        for r in part.collect()
    ]
    exp = set()
    for k, pc, sz in rows:
        dominated = any(
            (qc <= pc and qs <= sz and (qc < pc or qs < sz))
            for _, qc, qs in rows
        )
        if not dominated:
            exp.add((k, pc, sz))
    got = {
        (r["p_partkey"], r["price_c"], r["p_size"])
        for r in ranking.skyline_parts(part).collect()
    }
    assert got == exp
    assert got
    # frontier property: sorted by price, sizes strictly decrease
    # except between identical (price, size) duplicates
    fr = sorted(got, key=lambda t: (t[1], t[2]))
    for a, b in zip(fr, fr[1:]):
        assert b[2] < a[2] or (b[1] == a[1] and b[2] == a[2])
