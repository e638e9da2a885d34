"""Integer PageRank semantics: pure-Python mirror, damping bounds,
and iteration behavior."""

from pyspark.sql import functions as F

from geo_import_spark.operators import graph


def _tables(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def _py_pagerank(orders, custs, iters):
    n = len(custs)
    edges = [(o[0], (o[1] * 2654435761) % n) for o in orders]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {c: graph.PR_SCALE for c in custs}
    for _ in range(iters):
        s = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + r[u] // deg[u]
        r = {c: graph.PR_BASE + (85 * s.get(c, 0)) // 100 for c in custs}
    return r


def test_pagerank_matches_python_mirror(spark, sf_dir):
    orders_df, cust_df = _tables(spark, sf_dir)
    orders = [
        (r["o_custkey"], r["o_orderkey"])
        for r in orders_df.select("o_custkey", "o_orderkey").collect()
    ]
    custs = [r["c_custkey"] for r in cust_df.select("c_custkey").collect()]
    exp = _py_pagerank(orders, custs, graph.PR_ITERS)
    got = {
        r["node_id"]: r["pr"]
        for r in graph.pagerank(orders_df, cust_df).collect()
    }
    assert got == exp
    # ranks actually differentiate (the graph is not regular)
    assert len(set(got.values())) > 1


def test_pagerank_rank_bounds(spark, sf_dir):
    """Every rank >= the damping base; an isolated node sits exactly
    at the base after one step."""
    orders_df, cust_df = _tables(spark, sf_dir)
    rows = graph.pagerank(orders_df, cust_df).collect()
    assert all(r["pr"] >= graph.PR_BASE for r in rows)


def test_pagerank_zero_iters_is_uniform(spark, sf_dir):
    orders_df, cust_df = _tables(spark, sf_dir)
    rows = graph.pagerank(orders_df, cust_df, iters=0).collect()
    assert {r["pr"] for r in rows} == {graph.PR_SCALE}
    assert len(rows) == cust_df.count()
