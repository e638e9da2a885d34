"""Semantic tests for the extended TPC-H shapes (relational_ext):
hand-built micro-frames exercise the edge semantics the sf-parity
rows can't isolate — scalar-max ties (Q15), the sole-late-supplier
attribution (Q21), and the exact no-float average inequality (Q22)."""

import datetime as dt

from pyspark.sql import functions as F

from geo_import_spark.operators import relational_ext as rx


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_top_supplier_keeps_ties(spark):
    li = spark.createDataFrame(
        [
            # suppliers 1 and 2 tie at revenue 100.00 with zero discount;
            # supplier 3 trails
            (1, 100.0, 0.0, _ts("1996-02-01")),
            (2, 60.0, 0.0, _ts("1996-02-01")),
            (2, 40.0, 0.0, _ts("1996-02-01")),
            (3, 99.0, 0.0, _ts("1996-02-01")),
            # outside the quarter — must be ignored
            (3, 500.0, 0.0, _ts("1997-01-01")),
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")],
        "s_suppkey long, s_name string",
    )
    rows = {r.s_suppkey: r.total_rev_c4
            for r in rx.top_supplier(li, supp).collect()}
    assert rows == {1: 100_00 * 100, 2: 100_00 * 100}


def test_sole_late_supplier_attribution(spark):
    od = _ts("1996-01-01")
    late = _ts("1996-06-01")   # > 75 days after order date
    ok = _ts("1996-01-10")
    li = spark.createDataFrame(
        [
            # order 1: two suppliers, only supplier 7 late -> blamed
            (1, 7, late), (1, 8, ok),
            # order 2: two suppliers, both late -> nobody blamed
            (2, 7, late), (2, 8, late),
            # order 3: single supplier late -> not multi-supplier, skip
            (3, 7, late),
            # order 4: two suppliers, none late -> skip
            (4, 7, ok), (4, 9, ok),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(k, od, "F") for k in (1, 2, 3, 4)],
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    supp = spark.createDataFrame(
        [(7, "seven"), (8, "eight"), (9, "nine")],
        "s_suppkey long, s_name string",
    )
    got = rx.sole_late_suppliers(orders, li, supp).collect()
    assert [(r.s_suppkey, r.numwait) for r in got] == [(7, 1)]


def test_sole_late_ignores_open_orders(spark):
    od = _ts("1996-01-01")
    late = _ts("1996-06-01")
    li = spark.createDataFrame(
        [(1, 7, late), (1, 8, od)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(1, od, "O")],  # not finished -> excluded
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    supp = spark.createDataFrame([(7, "seven"), (8, "eight")],
                                 "s_suppkey long, s_name string")
    assert rx.sole_late_suppliers(orders, li, supp).count() == 0


def test_dormant_rich_exact_average_boundary(spark):
    # positive balances: 10.00, 20.00, 30.00 -> mean 20.00 exactly;
    # the strict inequality must EXCLUDE the exactly-average customer.
    cust = spark.createDataFrame(
        [
            (1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0),
            (4, 1, -5.0),  # negative: not in the average, never rich
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        # customer 3 ordered recently -> not dormant
        [(100, 3, _ts("2000-06-01")), (101, 1, _ts("1996-01-01"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = rx.dormant_rich_customers(cust, orders).collect()
    # only customer 3 is above-average (30 > 20); but it has a recent
    # order, so nobody qualifies
    assert got == []

    # remove the recent order -> customer 3 qualifies under nation 1
    orders2 = orders.filter(F.col("o_custkey") != 3)
    got2 = rx.dormant_rich_customers(cust, orders2).collect()
    assert [(r.c_nationkey, r.numcust, r.totacctbal_c) for r in got2] == [
        (1, 1, 3000)
    ]
