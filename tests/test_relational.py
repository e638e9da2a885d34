"""Relational showcase (TPC-H-shaped): plan-shape and exactness
tests. Value parity vs DuckDB is covered query-by-query in
test_oracle_parity.py; here we pin the physical plans and the
integer-money determinism rules."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import relational


def _plan(df) -> str:
    # keep only the AQE final plan — the "Initial Plan" section repeats
    # every node and would double Exchange counts
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


@pytest.fixture()
def tables(spark, sf_dir):
    names = ("region", "nation", "customer", "supplier", "orders", "lineitem")
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def test_q1_filter_is_pushed_and_one_shuffle(spark, sf_dir, tables):
    df = relational.pricing_summary(tables["lineitem"])
    df.collect()
    plan = _plan(df)
    # the shipdate filter must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # one partial+final aggregate pair over one exchange
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_q1_money_math_is_exact_bigint(spark, tables):
    row = relational.pricing_summary(tables["lineitem"]).limit(1).collect()[0]
    for c in ("sum_qty", "sum_base_price_c", "sum_disc_price_c4", "sum_charge_c6"):
        assert isinstance(row[c], int), c


def test_q3_broadcasts_customer_and_orders_join_is_keyed(spark, tables):
    df = relational.shipping_priority(
        tables["customer"], tables["orders"], tables["lineitem"]
    )
    out = df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # deterministic top-k: revenue desc then orderkey asc
    revs = [(r.revenue_c4, r.o_orderkey) for r in out]
    assert revs == sorted(revs, key=lambda t: (-t[0], t[1]))
    assert len(out) <= relational.Q3_TOPK


def test_q5_all_dims_broadcast_no_cartesian(spark, tables):
    df = relational.local_supplier_volume(tables)
    out = df.collect()
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # nation/customer/supplier probes
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert len(out) >= 1
    # revenue is exact integer 1e-4-dollar units
    assert all(isinstance(r.revenue_c4, int) for r in out)


def test_q5_matches_duckdb_exactly(spark, sf_dir, tables):
    got = sorted(
        (r.n_name, r.revenue_c4)
        for r in relational.local_supplier_volume(tables).collect()
    )
    con = duckdb.connect()
    for n in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {n} AS SELECT * FROM '{sf_dir}/{n}.parquet'")
    exp = sorted(
        (n, int(v))
        for n, v in con.sql(relational.SQL_LOCAL_SUPPLIER_VOLUME).fetchall()
    )
    assert got == exp


def test_q17_exact_predicate_matches_float_semantics(spark, sf_dir):
    """5*qty*cnt < sum_qty is exactly qty < 0.2 * per-part avg —
    verified against a float brute force (quantities are integers, so
    no boundary ambiguity exists)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    row = relational.small_quantity_revenue(li, part).collect()[0]

    keys = {
        r["p_partkey"]
        for r in part.filter(F.col("p_brand") == relational.Q17_BRAND)
        .select("p_partkey").collect()
    }
    rows = [
        (r["l_partkey"], int(r["l_quantity"]),
         int(r["l_extendedprice"] * 100 + 0.5))
        for r in li.select("l_partkey", "l_quantity", "l_extendedprice")
        .collect() if r["l_partkey"] in keys
    ]
    from collections import defaultdict
    s = defaultdict(int)
    c = defaultdict(int)
    for k, q, _ in rows:
        s[k] += q
        c[k] += 1
    small = [(k, q, p) for k, q, p in rows if q < 0.2 * (s[k] / c[k])]
    assert row["n_small"] == len(small)
    assert row["sum_price_cents"] == sum(p for _, _, p in small)
    assert row["n_small"] > 0


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = relational.customer_distribution(cust, orders).collect()
    hist = {r["c_count"]: r["custdist"] for r in rows}
    assert sum(hist.values()) == cust.count()
    active = (
        orders.filter(F.col("o_orderpriority") != relational.Q13_EXCLUDE)
        .select("o_custkey").distinct().count()
    )
    assert hist.get(0, 0) == cust.count() - active
