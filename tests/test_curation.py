"""Curation-batch semantics: deterministic split, token-window
chunking, unigram-LM scoring, and Bloom-prefiltered snapshot dedup."""

import math

import pytest
from pyspark.sql import functions as F

from geo_import_spark import corpus
from geo_import_spark.operators import curation


def _docs(spark, sf_dir):
    return corpus.spread_scan(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


# --- split_assign -----------------------------------------------------------

def test_split_assign_rehash_stable(spark, sf_dir):
    """Assignments are a pure function of doc_id: computing the split
    on a half-corpus gives the identical assignment for every shared
    doc — growing the corpus never flips an existing document."""
    docs = _docs(spark, sf_dir)
    full = curation.split_assign(docs)
    half = curation.split_assign(docs.filter(F.col("doc_id") % 2 == 0))
    joined = full.join(half.withColumnRenamed("split", "split2"), "doc_id")
    assert joined.count() == half.count()
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0


def test_split_assign_partitions_whole_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = curation.split_assign(docs)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # train dominates under the 1%/2% fences
    assert counts.get("train", 0) > counts.get("val", 0) >= 0
    assert counts.get("train", 0) > counts.get("test", 0) >= 0


def test_split_assign_is_pure_map(spark, sf_dir):
    # plain scan (spread_scan adds its own single-file repartition)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = curation.split_assign(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# --- chunk_documents --------------------------------------------------------

def test_chunk_documents_window_arithmetic(spark):
    """75 tokens, size 32, overlap 8 (stride 24) -> 3 chunks at starts
    0/24/48; every token covered; consecutive chunks share exactly the
    overlap; last chunk is the remainder."""
    text = " ".join(f"t{i:03d}" for i in range(75))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    rows = sorted(
        curation.chunk_documents(df).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    chunks = [r["chunk_text"].split(" ") for r in rows]
    assert [r["n_chunk_tokens"] for r in rows] == [32, 32, 27]
    assert [len(c) for c in chunks] == [32, 32, 27]
    # starts at stride multiples, contiguous coverage
    assert chunks[0][0] == "t000" and chunks[1][0] == "t024"
    assert chunks[2][0] == "t048" and chunks[2][-1] == "t074"
    # consecutive full chunks share exactly `overlap` tokens
    assert chunks[0][-8:] == chunks[1][:8]
    assert set().union(*map(set, chunks)) == {f"t{i:03d}" for i in range(75)}


def test_chunk_documents_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], "doc_id: long, text: string"
    )
    rows = {r["doc_id"]: r for r in curation.chunk_documents(df).collect()}
    assert len(rows) == 2  # exactly one chunk each
    assert rows[1]["n_chunk_tokens"] == 3
    assert rows[1]["chunk_text"] == "only three tokens"
    assert rows[2]["n_chunk_tokens"] == 0
    assert rows[2]["chunk_text"] == ""


def test_chunk_documents_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = curation.chunk_documents(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- lm_score ---------------------------------------------------------------

def test_lm_score_hand_example(spark):
    """vocab over {a a b, b c}: n(a)=2 n(b)=2 n(c)=1, total 5."""
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: r for r in curation.lm_score(df).collect()}
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2
    assert got[1]["lm_logprob"] == pytest.approx(
        round(math.log(2 / 5), 6), abs=1e-9
    )
    assert got[2]["lm_logprob"] == pytest.approx(
        round((math.log(2 / 5) + math.log(1 / 5)) / 2, 6), abs=1e-9
    )


def test_lm_score_rare_tokens_score_lower(spark, sf_dir):
    """A doc made of unique junk tokens must score below every corpus
    doc (its tokens have corpus frequency 1)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    junk = docs.sparkSession.createDataFrame(
        [(-1, "zqxj1 zqxj2 zqxj3 zqxj4")], "doc_id: long, text: string"
    )
    scored = curation.lm_score(docs.unionByName(junk))
    junk_score = scored.filter("doc_id = -1").collect()[0]["lm_logprob"]
    best_other = scored.filter("doc_id >= 0") \
        .agg(F.min("lm_logprob")).collect()[0][0]
    assert junk_score < best_other


# --- snapshot_delta ---------------------------------------------------------

def test_snapshot_delta_equals_plain_antijoin(spark, sf_dir):
    """Bloom has no false negatives and the anti-join removes false
    positives, so the result is EXACTLY the anti-join semantics."""
    docs = _docs(spark, sf_dir)
    snap = docs.filter(F.col("doc_id") % 5 == 0)
    got = curation.snapshot_delta(docs, snap)

    fp = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", curation.tokens_col(F.col("text"))))
        .alias("fingerprint"),
    )
    snap_fp = fp.filter(F.col("doc_id") % 5 == 0) \
        .select("fingerprint").distinct()
    expect = fp.join(snap_fp, "fingerprint", "left_anti") \
        .select("doc_id", "fingerprint")
    assert got.count() == expect.count()
    assert got.join(expect, ["doc_id", "fingerprint"]).count() == expect.count()


def test_snapshot_bloom_no_false_negatives(spark):
    """Every snapshot fingerprint must probe to all-ones in the bitmap
    it was folded into (tiny m forces dense collisions; correctness
    must hold anyway)."""
    vals = [(f"fp{i}",) for i in range(200)]
    snap = spark.createDataFrame(vals, "fp: string")
    m_bits, k = 1 << 10, 4
    dense = curation.snapshot_bloom(snap, m_bits, k)
    assert len(dense) == m_bits // 64
    probed = snap.crossJoin(
        F.broadcast(spark.createDataFrame([(dense,)], "bloom: array<long>"))
    )
    pos = curation._bloom_positions(F.col("fp"), m_bits, k)
    sel = probed.select(
        "fp", "bloom", *[p.alias(f"_bit{i}") for i, p in enumerate(pos)]
    )
    hit = None
    for i in range(k):
        probe = F.expr(
            f"(shiftright(element_at(bloom, CAST(_bit{i} / 64 AS INT) + 1),"
            f" CAST(_bit{i} % 64 AS INT)) & 1) = 1"
        )
        hit = probe if hit is None else (hit & probe)
    assert sel.filter(~hit).count() == 0


def test_snapshot_delta_disjoint_snapshot_passes_everything(spark):
    """With a disjoint snapshot every new doc must survive — including
    any bloom false positives (routed through the exact anti-join)."""
    new = spark.createDataFrame(
        [(i, f"new doc {i}") for i in range(300)], "doc_id: long, text: string"
    )
    snap = spark.createDataFrame(
        [(10_000 + i, f"old doc {i}") for i in range(300)],
        "doc_id: long, text: string",
    )
    # tiny bitmap => false positives certain; result must still be exact
    got = curation.snapshot_delta(new, snap, m_bits=256, k=2)
    assert got.count() == 300


# --- curation_verdict (composed keep/drop) ----------------------------------------

def test_curation_verdict_matches_python_rules(spark, sf_dir):
    """The fused one-pass verdict equals a rule-by-rule Python rerun
    (dup > too_short > gibberish > repetitive > keep)."""
    import hashlib
    from collections import defaultdict

    from geo_import_spark import corpus as corpusmod

    docs = corpusmod.dirty_documents(spark, sf_dir)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    canon = defaultdict(lambda: 1 << 62)
    for d, t in rows.items():
        fp = hashlib.md5(t.encode()).hexdigest()
        canon[fp] = min(canon[fp], d)

    def verdict(d, t):
        toks = [x for x in t.lower().split() if x]
        fp = hashlib.md5(t.encode()).hexdigest()
        if d != canon[fp]:
            return "dup"
        if len(toks) < curation.MIN_TOKENS:
            return "too_short"
        if sum(map(len, toks)) / len(toks) > curation.MAX_MEAN_TOKEN_LEN:
            return "gibberish"
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bgs and max(bgs.count(x) for x in set(bgs)) / len(bgs) > curation.REP_MAX:
            return "repetitive"
        return "keep"

    got = {r["doc_id"]: (r["verdict"], r["keep"])
           for r in curation.curation_verdict(docs).collect()}
    exp = {d: verdict(d, t) for d, t in rows.items()}
    assert {d: v for d, (v, _) in got.items()} == exp
    assert all(k == int(v == "keep") for _, (v, k) in got.items())
    # every rule fires at test SF (the dirty corpus guarantees a mix)
    assert set(exp.values()) == {"dup", "too_short", "gibberish",
                                 "repetitive", "keep"}


def test_curation_verdict_single_shuffle(spark, sf_dir):
    """The fused plan shuffles exactly once (the dup-canonicality
    window); the signal math never joins operator outputs on doc_id."""
    from geo_import_spark import corpus as corpusmod

    plan = (
        curation.curation_verdict(corpusmod.dirty_documents(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the window; the corpus spread_scan repartition
    # of the tiny single-file test input may add one more
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan and "Python" not in plan
