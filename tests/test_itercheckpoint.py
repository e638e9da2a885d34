"""Durable-checkpoint loops (VERDICT r3 #2): a run killed mid-loop and
called again with the same checkpoint_dir RESUMES from the newest
completed round — earlier rounds' parquet is untouched, no label round
recomputes — and lands on the identical final answer as an
uninterrupted run."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_import_spark.operators import dedup as dedupmod
from geo_import_spark.operators import graph as graphmod
from geo_import_spark.operators import knn as knnmod
from geo_import_spark.plans.itercheckpoint import LoopCheckpointer


def _chain_docs(spark, n=9):
    """A single n-doc chain d0-d1-…-d(n-1): min-label propagation needs
    ~log-diameter rounds to converge, so a 2-round kill is mid-flight."""
    docs = spark.createDataFrame([Row(doc_id=f"d{i}") for i in range(n)])
    pairs = spark.createDataFrame(
        [Row(doc_a=f"d{i}", doc_b=f"d{i+1}") for i in range(n - 1)]
    )
    return docs, pairs


def _rounds_on_disk(root, name):
    base = os.path.join(root, name)
    if not os.path.isdir(base):
        return {}
    return {
        d: os.path.getmtime(os.path.join(base, d, "_SUCCESS"))
        for d in sorted(os.listdir(base))
        if os.path.exists(os.path.join(base, d, "_SUCCESS"))
    }


def test_clusters_kill_and_resume(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    docs, pairs = _chain_docs(spark, n=9)
    expected = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedupmod.duplicate_clusters(docs, pairs=pairs).collect()
    }
    assert set(expected.values()) == {"d0"}  # one chain, min label d0

    # "kill" after 2 rounds: max_rounds=2 leaves durable rounds 0-2 on
    # disk, NOT converged (a 9-chain needs more than 2 min-label rounds
    # to flood d0 to the far end). Since the ADVICE-r4 guard, hitting
    # the budget with changes pending RAISES instead of returning
    # partial labels that look valid — the durable rounds survive the
    # failure, which is exactly the kill we want to simulate.
    with pytest.raises(RuntimeError, match="did not converge"):
        dedupmod.duplicate_clusters(
            docs, pairs=pairs, max_rounds=2, checkpoint_dir=ckdir
        ).collect()
    before = _rounds_on_disk(ckdir, "labels")
    assert set(before) == {"round_00000", "round_00001", "round_00002"}

    # resume: same dir, full budget — converges to the clean answer
    resumed = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedupmod.duplicate_clusters(
            docs, pairs=pairs, checkpoint_dir=ckdir
        ).collect()
    }
    assert resumed == expected
    after = _rounds_on_disk(ckdir, "labels")
    # completed rounds were NOT recomputed (same _SUCCESS mtimes) and
    # the resumed run appended strictly later rounds
    for d, mtime in before.items():
        assert after[d] == mtime
    assert len(after) > len(before)


def test_clusters_resume_of_converged_run_is_idempotent(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    docs, pairs = _chain_docs(spark, n=5)
    first = dedupmod.duplicate_clusters(
        docs, pairs=pairs, checkpoint_dir=ckdir
    ).collect()
    again = dedupmod.duplicate_clusters(
        docs, pairs=pairs, checkpoint_dir=ckdir
    ).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))


def test_knn_kill_and_resume(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    import math

    pts = spark.createDataFrame(
        [
            Row(doc_id=f"p{i}", lon=float((i * 37) % 160 - 80),
                lat=float((i * 53) % 140 - 70))
            for i in range(400)
        ]
    )
    qs = spark.createDataFrame(
        [Row(query_id=f"q{i}", qlon=float(i * 13 - 60), qlat=float(i * 7 - 30))
         for i in range(10)]
    )
    clean = sorted(
        map(tuple, knnmod.knn_join(qs, pts, k=3, level=6).collect())
    )
    # kill after round 0 (tiny ring: most queries unsettled)
    knnmod.knn_join(qs, pts, k=3, level=6, max_rounds=1, checkpoint_dir=ckdir)
    pend = _rounds_on_disk(ckdir, "pending")
    assert set(pend) == {"round_00000"}
    resumed = sorted(
        map(tuple, knnmod.knn_join(qs, pts, k=3, level=6,
                                   checkpoint_dir=ckdir).collect())
    )
    assert resumed == clean
    assert not math.isnan(resumed[0][3])


def test_pagerank_durable_matches_default(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    cust = spark.createDataFrame([Row(c_custkey=i) for i in range(1, 21)])
    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=(i % 20) + 1) for i in range(1, 101)]
    )
    base = sorted(map(tuple, graphmod.pagerank(orders, cust).collect()))
    durable = sorted(
        map(tuple, graphmod.pagerank(orders, cust, checkpoint_dir=ckdir).collect())
    )
    assert base == durable
    assert len(_rounds_on_disk(ckdir, "ranks")) == graphmod.PR_ITERS


def test_incomplete_round_is_invisible(spark, tmp_path):
    """A round directory without _SUCCESS (kill mid-write) must not be
    offered as a resume point."""
    ckdir = str(tmp_path / "ck")
    ck = LoopCheckpointer(ckdir, name="labels")
    df = spark.createDataFrame([Row(doc_id="a", label="a")])
    ck.truncate(df, 0)
    # simulate a torn round-1 write
    torn = os.path.join(ckdir, "labels", "round_00001")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    last, _saved = ck.latest(spark)
    assert last == 0
    assert ck.load(spark, 1) is None
