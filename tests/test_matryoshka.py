"""Semantic tests for matryoshka_recall (value parity vs DuckDB runs
in test_oracle_parity): identity truncation recovers everything, the
query itself always overlaps, planted prefix-determined embeddings
give perfect recall at the prefix width, and the frame shape is
always |dims| x n_queries."""

import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_identity_truncation_recovers_full_topk(emb):
    rows = similarity.matryoshka_recall(emb, dims=(similarity.DIM,)).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_overlap == 10


def test_self_always_overlaps_and_shape(emb):
    rows = similarity.matryoshka_recall(emb).collect()
    assert len(rows) == len(similarity.MATRYOSHKA_DIMS) * 10
    for r in rows:
        # the query itself is rank 1 (cos = 1) at every width
        assert 1 <= r.n_overlap <= 10


def test_planted_prefix_determined_embeddings(spark):
    # vectors with an all-zero tail: the tail contributes nothing to
    # any dot product or norm, so the d=2 cosine EQUALS the full
    # cosine and truncation must reproduce the full top-k exactly
    dim = similarity.DIM
    tail = [0.0] * (dim - 2)
    rows = [(i, [float(i + 1), float(i % 7 + 1)] + tail) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.matryoshka_recall(e, n_queries=5, k=5, dims=(2,))
    for r in got.collect():
        assert r.n_overlap == 5


def test_zero_norm_prefix_is_dropped_not_crash(spark):
    # vec 0's first two dims are all-zero: at d=2 it is unindexable
    # and must be dropped from that width's pool (and its query slot
    # zero-filled), not raise ANSI divide-by-zero
    dim = similarity.DIM
    tail = [0.5] * (dim - 2)
    rows = [(0, [0.0, 0.0] + tail)] + [
        (i, [float(i), 1.0] + tail) for i in range(1, 20)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.query_id: r.n_overlap
           for r in similarity.matryoshka_recall(
               e, n_queries=3, k=5, dims=(2,)).collect()}
    assert got[0] == 0           # unindexable query -> zero overlap
    assert got[1] >= 1 and got[2] >= 1


# --- sq8_recall ------------------------------------------------------------


def test_sq8_shape_and_bounds(emb):
    rows = similarity.sq8_recall(emb).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_overlap <= 10


def test_sq8_perfect_on_already_quantized(spark):
    # vectors whose coordinates already sit exactly on a 255-step
    # lattice between the per-dim min and max quantize losslessly ->
    # the SQ8 top-k must equal the full top-k for every query
    dim = similarity.DIM
    rows = []
    for i in range(30):
        v = [float(((i + 1) * (j + 3)) % 256) for j in range(dim)]
        rows.append((i, v))
    # force per-dim envelope to [0, 255] so the lattice is exact
    rows.append((1000, [0.0] * dim))
    rows.append((1001, [255.0] * dim))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.sq8_recall(e, n_queries=5, k=5).collect()
    assert len(got) == 5
    for r in got:
        assert r.n_overlap == 5
