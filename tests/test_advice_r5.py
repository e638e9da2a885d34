"""Regression tests for round-4 review findings (ADVICE.md r4):
grid_dbscan's touched-once plan contract, loud non-convergence in the
iterative label loops, and the ohlc_bars composite-key range guard."""

import pytest
from pyspark.sql import Row, functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import dbscan, dedup, graph, timeseries


def _chain(spark, n):
    """Path graph d000-d001-...-d(n-1): diameter n-1, the worst case
    for min-label propagation (one hop per round)."""
    docs = spark.createDataFrame([Row(doc_id=f"d{i:03d}") for i in range(n)])
    pairs = spark.createDataFrame(
        [Row(doc_a=f"d{i:03d}", doc_b=f"d{i + 1:03d}") for i in range(n - 1)]
    )
    return docs, pairs


def test_grid_dbscan_points_touched_once_in_plan(spark, sf_dir):
    plan = (
        dbscan.grid_dbscan(corpus.points(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ADVICE r4: the histogram used to be re-expanded ~44x, re-scanning
    # the parquet point source each time. With hist/occ lineage-pinned
    # the final plan reads only checkpointed RDDs.
    assert plan.count("Scan parquet") <= 1


def test_duplicate_clusters_nonconvergence_raises(spark):
    docs, pairs = _chain(spark, 10)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(docs, pairs=pairs, max_rounds=3)


def test_duplicate_clusters_chain_converges_with_enough_rounds(spark):
    docs, pairs = _chain(spark, 10)
    out = dedup.duplicate_clusters(docs, pairs=pairs, max_rounds=12).collect()
    assert len(out) == 10
    assert {r["cluster_rep"] for r in out} == {"d000"}


def test_bfs_hops_nonconvergence_raises(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # one relaxation round always changes >= 1 distance on any graph
    # with an edge, so max_rounds=1 must end loudly, never silently.
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.bfs_hops(li, max_rounds=1)


def test_ohlc_event_id_guard_raises(spark):
    bad = spark.createDataFrame(
        [
            Row(
                event_type="t",
                event_id=10**12,
                ts="2024-01-01 00:00:00",
                value=1.5,
            )
        ]
    )
    with pytest.raises(Exception, match="outside \\[0, 10\\^12\\)"):
        timeseries.ohlc_bars(bad).collect()


def test_ohlc_guard_transparent_for_valid_ids(spark):
    ok = spark.createDataFrame(
        [
            Row(event_type="t", event_id=1, ts="2024-01-01 00:00:10", value=2.0),
            Row(event_type="t", event_id=2, ts="2024-01-01 00:00:05", value=9.0),
            Row(event_type="t", event_id=3, ts="2024-01-01 00:00:20", value=4.0),
        ]
    )
    row = timeseries.ohlc_bars(ok).collect()[0]
    assert (
        row["open_mi"],
        row["high_mi"],
        row["low_mi"],
        row["close_mi"],
        row["n"],
    ) == (9_000_000, 9_000_000, 2_000_000, 4_000_000, 3)
