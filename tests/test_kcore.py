"""k-core peeling: planted-graph semantics, fixpoint guard, and the
corpus query's structural invariants. Hash parity with the
unrolled-peel DuckDB mirror runs in test_oracle_parity.py (`k_core`).
"""

import pytest

from geo_import_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _core(df):
    return {r["node"]: r["core_deg"] for r in df.collect()}


def test_clique_survives_whole(spark):
    # K5: every node has degree 4 -> the 4-core is the whole clique
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    core = _core(graph.peel_core(_edges(spark, k5), k=4, max_rounds=4))
    assert core == {n: 4 for n in range(5)}


def test_pendant_chain_peels_in_rounds(spark):
    # K4 with a 3-node pendant chain 3-4-5-6: each round peels one
    # chain tail (degree 1 < 2), so fixpoint needs 4 rounds; the
    # 2-core is exactly the K4.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 4), (4, 5), (5, 6)]
    e = _edges(spark, k4 + chain)
    core = _core(graph.peel_core(e, k=2, max_rounds=8))
    assert core == {0: 3, 1: 3, 2: 3, 3: 3}


def test_whole_graph_can_peel_to_empty(spark):
    # a path graph has an empty 2-core
    path = [(i, i + 1) for i in range(5)]
    assert graph.peel_core(_edges(spark, path), k=2, max_rounds=8).count() == 0


def test_guard_raises_before_fixpoint(spark):
    # the pendant chain needs 4 rounds; 2 must raise, not return a
    # half-peeled set (the convergence guard ADVICE asked for)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 4), (4, 5), (5, 6)]
    e = _edges(spark, k4 + chain)
    with pytest.raises(RuntimeError, match="fixpoint"):
        graph.peel_core(e, k=2, max_rounds=2).collect()


def test_corpus_core_invariants(spark, sf_dir):
    core = _core(graph.k_core(spark.read.parquet(f"{sf_dir}/lineitem.parquet")))
    assert len(core) > 0  # nontrivial at the test SF (sized in-module)
    assert all(d >= graph.KCORE_K for d in core.values())
    # the k-core is an induced subgraph: core_deg never exceeds the
    # node's degree in the sparsified graph
    full = {
        r["src"]: r["deg"]
        for r in (
            lambda e: e.unionAll(
                e.selectExpr("dst as src", "src as dst")
            )
            .groupBy("src")
            .count()
            .withColumnRenamed("count", "deg")
        )(
            graph._part_edges_sparse(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            )
        ).collect()
    }
    assert all(core[n] <= full[n] for n in core)
