"""Round-5 batch 3: linear referencing (line_interpolate), compass
octant histogram (od_bearing), ANN hard-negative mining, tokenizer
vocabulary coverage.

Corpus parity with the DuckDB oracles runs in test_oracle_parity.py
(auto-parametrized, includes the cluster_hulls composition); these
tests pin the semantics on planted inputs where the expected answer
is known by construction.
"""

from pyspark.sql import functions as F

from geo_import_spark.operators import lineref, similarity, textops, trajectory


def _walk(spark, rows):
    return spark.createDataFrame(rows, "cust long, i long, x long, y long")


# --- line_interpolate --------------------------------------------------------


def test_line_interpolate_l_track(spark):
    # L-shaped track (0,0)->(100,0)->(100,100): Chebyshev hops 100+100,
    # quarter points at 1/4 (mid of hop 1), 1/2 (corner, start of hop
    # 2 by the half-open interval), 3/4 (mid of hop 2)
    walk = _walk(spark, [(1, 0, 0, 0), (1, 1, 100, 0), (1, 2, 100, 100)])
    got = {
        r["frac_k"]: (r["px"], r["py"])
        for r in lineref.line_interpolate(walk).collect()
    }
    assert got == {1: (50, 0), 2: (100, 0), 3: (100, 50)}


def test_line_interpolate_zero_length_segment_skipped(spark):
    # duplicate ping mid-track: its empty interval can never match, and
    # the lerp denominator is never evaluated on it
    walk = _walk(
        spark,
        [(1, 0, 0, 0), (1, 1, 100, 0), (1, 2, 100, 0), (1, 3, 200, 0)],
    )
    got = {
        r["frac_k"]: (r["px"], r["py"])
        for r in lineref.line_interpolate(walk).collect()
    }
    assert got == {1: (50, 0), 2: (100, 0), 3: (150, 0)}


def test_line_interpolate_degenerate_tracks_empty(spark):
    # single ping and all-coincident pings: total length 0, no rows
    walk = _walk(spark, [(1, 0, 5, 5), (2, 0, 7, 7), (2, 1, 7, 7)])
    assert lineref.line_interpolate(walk).count() == 0


def test_line_interpolate_single_cust_exchange(spark):
    walk = _walk(spark, [(1, 0, 0, 0), (1, 1, 100, 0)])
    plan = (
        lineref.line_interpolate(walk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(cust") <= 1


# --- od_bearing --------------------------------------------------------------


def _stays(spark, rows):
    return spark.createDataFrame(rows, "cust long, start_i long, ax long, ay long")


def test_od_bearing_octants(spark):
    # anchors walk E (sector 0), NE-diagonal (dy>=dx -> 1), NW with
    # -dx>=dy (-> 3), SW diagonal (-dy>=-dx -> 5); the repeated anchor
    # produces a (0,0) hop that is dropped as NULL
    stays = _stays(
        spark,
        [
            (1, 0, 0, 0),
            (1, 10, 10, 0),
            (1, 20, 20, 10),
            (1, 30, 10, 20),
            (1, 40, 10, 20),
            (1, 50, 0, 10),
        ],
    )
    got = {
        r["sector"]: (r["n_trips"], r["l1_total"])
        for r in lineref.od_bearing(stays).collect()
    }
    assert got == {0: (1, 10), 1: (1, 20), 3: (1, 20), 5: (1, 20)}


def test_od_bearing_boundary_assignment(spark):
    # exact 45-degree hops land deterministically: (+d,+d) -> 1,
    # (-d,+d) -> 3, (-d,-d) -> 5, (+d,-d) -> 7; axis hops: +x -> 0,
    # +y -> 2, -x -> 4, -y -> 6
    hops = [(5, 5), (-5, 5), (-5, -5), (5, -5), (5, 0), (0, 5), (-5, 0), (0, -5)]
    expected = [1, 3, 5, 7, 0, 2, 4, 6]
    rows, x, y = [], 0, 0
    for j, (dx, dy) in enumerate(hops):
        rows.append((j, 0, 0, 0))
        rows.append((j, 1, dx, dy))
    got = {
        r["sector"]: r["n_trips"] for r in lineref.od_bearing(_stays(spark, rows)).collect()
    }
    assert got == {s: 1 for s in expected}


# --- hard_negatives ----------------------------------------------------------


def test_hard_negatives_excludes_near_dups(spark):
    # query v0=[1,0]; v1 is a scaled copy (cos=1.0 -> excluded as a
    # positive); the rest rank by cosine: v3 (0.894) > v2 (0.707) > v4 (0)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),
            (2, [1.0, 1.0]),
            (3, [1.0, 0.5]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.hard_negatives(emb, n_queries=1, k=5).collect()
    assert [(r["vec_id"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        (3, 1),
        (2, 2),
        (4, 3),
    ]


def test_hard_negatives_k_cut(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.hard_negatives(emb, n_queries=1, k=2).collect()
    assert sorted(r["rank"] for r in rows if r["query_id"] == 0) == [1, 2]


# --- vocab_coverage ----------------------------------------------------------


def test_vocab_coverage_planted(spark):
    # corpus counts: a:3, b:3, c:1, d:2; top-2 vocab = {a, b}
    # (count desc, token asc breaks the a/b tie deterministically)
    docs = spark.createDataFrame(
        [(1, "a a b c", "A"), (2, "a b b d d", "B")],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (r["total_tokens"], r["oov_tokens"], r["oov_bp"])
        for r in textops.vocab_coverage(docs, v=2).collect()
    }
    assert got == {"A": (4, 1, 2500), "B": (5, 2, 4000)}


def test_vocab_coverage_full_cover(spark):
    # v >= |vocabulary| -> zero OOV everywhere
    docs = spark.createDataFrame(
        [(1, "x y", "A"), (2, "y z", "B")],
        "doc_id long, text string, source string",
    )
    rows = textops.vocab_coverage(docs, v=10).collect()
    assert all((r["oov_tokens"], r["oov_bp"]) == (0, 0) for r in rows)


def test_vocab_coverage_uses_takeordered(spark, sf_dir):
    # the vocabulary cut must plan as a distributed top-v
    # (TakeOrderedAndProject), not a single-partition global window
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        textops.vocab_coverage(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
