"""Integer PageRank semantics: pure-Python mirror, damping bounds,
and iteration behavior."""

from pyspark.sql import functions as F

from geo_import_spark import corpus
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


def test_bfs_hops_matches_python_bfs(spark, sf_dir):
    from collections import deque

    li = corpus.spread_scan(
        spark, spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    edges = graph.cooccur_edges(li).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    s0 = min(adj)
    exp, q = {s0: 0}, deque([s0])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in exp:
                exp[v] = exp[u] + 1
                q.append(v)
    got = {r["node"]: r["hops"] for r in graph.bfs_hops(li).collect()}
    assert got == exp
    assert max(exp.values()) < graph.BFS_MAX_ROUNDS, (
        "diameter must stay under both loop caps for the oracle to agree"
    )


def test_bfs_hops_excludes_unreachable_component(spark):
    from pyspark.sql import Row

    # two components: {1,2,3} chained, {7,8} chained (share no order)
    rows = [
        Row(l_orderkey=1, l_suppkey=1), Row(l_orderkey=1, l_suppkey=2),
        Row(l_orderkey=2, l_suppkey=2), Row(l_orderkey=2, l_suppkey=3),
        Row(l_orderkey=3, l_suppkey=7), Row(l_orderkey=3, l_suppkey=8),
    ]
    got = {
        r["node"]: r["hops"]
        for r in graph.bfs_hops(spark.createDataFrame(rows)).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}
