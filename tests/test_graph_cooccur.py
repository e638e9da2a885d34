"""Semantic tests for the co-occurrence graph operators: edge
dedup/weights, degree histogram, and triangle enumeration on a
hand-built graph with a known triangle count."""

from geo_import_spark.operators import graph as g


def _li(spark, rows):
    # rows: (orderkey, suppkey)
    return spark.createDataFrame(
        [(ok, s, 1) for ok, s in rows],
        "l_orderkey long, l_suppkey long, l_linenumber int",
    )


def test_cooccur_weights_and_orientation(spark):
    li = _li(spark, [
        (1, 10), (1, 20),          # edge (10,20)
        (2, 20), (2, 10),          # same pair again -> w=2
        (2, 10),                   # duplicate line: distinct() drops it
        (3, 30),                   # singleton order: no edge
    ])
    got = {(r.src, r.dst): r.w for r in g.cooccur_edges(li).collect()}
    assert got == {(10, 20): 2}


def test_triangle_count_known_graph(spark):
    # orders building K4 on {1,2,3,4} (4 triangles) plus a pendant
    # edge (4,5) that closes nothing
    li = _li(spark, [
        (1, 1), (1, 2), (1, 3), (1, 4),   # one order giving all K4 edges
        (2, 4), (2, 5),
    ])
    row = g.triangle_count(li).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_degree_histogram_known_graph(spark):
    # path graph 1-2-3: degrees 1,2,1
    li = _li(spark, [(1, 1), (1, 2), (2, 2), (2, 3)])
    got = {r.degree: r.n_nodes for r in g.degree_histogram(li).collect()}
    assert got == {1: 2, 2: 1}
