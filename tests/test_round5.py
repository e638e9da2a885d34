"""Round-5 operators: weighted SSSP, perceptual hash (aHash),
exact duplicated-substring spans.

Corpus parity with the DuckDB oracles runs in test_oracle_parity.py
(auto-parametrized); these tests pin the semantics on planted inputs
where the expected answer is known by construction.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import dedup as dedupmod
from geo_import_spark.operators import graph as graphmod
from geo_import_spark.operators.multimodal import _ahash16


# --- weighted SSSP ----------------------------------------------------------


def _lineitem_from_orders(spark, orders):
    """Build a minimal lineitem frame whose co-occurrence graph is the
    given (orderkey -> [suppliers]) map."""
    rows = [(ok, s) for ok, sups in orders for s in sups]
    return spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")


def test_weighted_sssp_line_graph_exact(spark):
    # path 1-2-3-4, each edge co-ordered once => cost 100//1+1 = 101
    li = _lineitem_from_orders(
        spark, [(10, [1, 2]), (20, [2, 3]), (30, [3, 4])]
    )
    got = {
        r["node"]: r["dist"]
        for r in graphmod.weighted_sssp(li).collect()
    }
    assert got == {1: 0, 2: 101, 3: 202, 4: 303}


def test_weighted_sssp_prefers_cheap_detour(spark):
    # direct edge 1-3 co-ordered once (cost 101); detour 1-2, 2-3
    # co-ordered 50x each (cost 100//50+1 = 3 per hop, total 6)
    orders = [(1000, [1, 3])]
    orders += [(i, [1, 2]) for i in range(50)]
    orders += [(100 + i, [2, 3]) for i in range(50)]
    li = _lineitem_from_orders(spark, orders)
    got = {
        r["node"]: r["dist"]
        for r in graphmod.weighted_sssp(li).collect()
    }
    assert got[3] == 6  # the weighted detour beats the direct hop
    assert got[2] == 3


def test_weighted_sssp_nonconvergence_raises(spark):
    # 4-hop path needs 4 relaxation rounds; max_rounds=2 must raise,
    # never return silently under-relaxed distances
    li = _lineitem_from_orders(
        spark,
        [(10, [1, 2]), (20, [2, 3]), (30, [3, 4]), (40, [4, 5])],
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graphmod.weighted_sssp(li, max_rounds=2)


# --- perceptual hash --------------------------------------------------------


def test_ahash_uniform_image_is_zero():
    # no block mean is STRICTLY above the global mean
    assert _ahash16(np.full((8, 8), 77, dtype=np.uint8)) == 0


def test_ahash_half_bright_pattern():
    # left half dark, right half bright: bits set exactly where bx>=2
    img = np.zeros((8, 8), dtype=np.uint8)
    img[:, 4:] = 200
    expected = sum(
        1 << (by * 4 + bx) for by in range(4) for bx in (2, 3)
    )
    assert _ahash16(img) == expected


def test_ahash_resolution_invariant():
    # the same half-bright pattern at 2x resolution hashes identically
    small = np.zeros((8, 8), dtype=np.uint8)
    small[:, 4:] = 200
    big = np.kron(small, np.ones((2, 2), dtype=np.uint8))
    assert _ahash16(small) == _ahash16(big)


def test_ahash_matches_bruteforce_blocks():
    rng = np.random.RandomState(7)
    for h, w in [(4, 4), (5, 9), (16, 32), (7, 13)]:
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        total = int(img.sum())
        npix = h * w
        expected = 0
        for by in range(4):
            for bx in range(4):
                ys = [y for y in range(h) if (y * 4) // h == by]
                xs = [x for x in range(w) if (x * 4) // w == bx]
                bs = int(img[np.ix_(ys, xs)].sum())
                if bs * npix > total * len(ys) * len(xs):
                    expected |= 1 << (by * 4 + bx)
        assert _ahash16(img) == expected, (h, w)


# --- duplicated-substring spans ---------------------------------------------


def test_dup_spans_planted(spark):
    K = 16
    boiler = "B" * (3 * K)  # 3 duplicated windows when K-aligned
    docs = spark.createDataFrame(
        [
            (1, boiler + "u" * K + "nique-one-" + "x" * 6),
            (2, boiler + "v" * K + "nique-two-" + "y" * 6),
            (3, "short"),  # < K chars: contributes nothing
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start_off"], r["end_off"]): r["n_windows"]
        for r in dedupmod.dup_spans(docs, k=K).collect()
    }
    # the 3-window boilerplate prefix is duplicated across docs 1 and
    # 2 and merges into ONE maximal [0, 48) run each; nothing else
    # repeats
    assert got == {(1, 0, 3 * K): 3, (2, 0, 3 * K): 3}


def test_dup_spans_within_doc_repeat(spark):
    K = 16
    rep = "r" * K
    docs = spark.createDataFrame(
        [(1, rep + "a" * K + rep)], "doc_id long, text string"
    )
    got = sorted(
        (r["start_off"], r["end_off"])
        for r in dedupmod.dup_spans(docs, k=K).collect()
    )
    # windows 0 and 2 share text; window 1 is unique => two runs
    assert got == [(0, K), (2 * K, 3 * K)]
