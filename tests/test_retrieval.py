"""Retrieval-batch semantics: BM25 vs a pure-Python reference,
winnowing fingerprint properties (SIGMOD'03 guarantee), BPE merge
counting."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import retrieval, trainprep


def _plain_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- bm25_search --------------------------------------------------------------

def _bm25_py(rows, terms, k1=1.2, b=0.75):
    toks = {r["doc_id"]: [t for t in r["text"].lower().split() if t]
            for r in rows}
    n = len(toks)
    dls = {d: len(v) for d, v in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = float(v.count(t))
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dls[d] / avgdl))
            )
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark, sf_dir):
    docs = _plain_docs(spark, sf_dir)
    got = {r["doc_id"]: r for r in retrieval.bm25_search(docs).collect()}
    ref = _bm25_py(docs.select("doc_id", "text").collect(), retrieval.BM25_QUERY)
    expect_rank = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(got) == sorted(d for d, _ in expect_rank)
    for rank, (d, score) in enumerate(expect_rank, start=1):
        assert got[d]["rank"] == rank
        assert got[d]["score"] == pytest.approx(score, abs=1e-9)


def test_bm25_prefers_term_density(spark):
    """Same length: more query-term mass scores higher. Same tf:
    shorter doc scores higher (length normalization)."""
    docs = spark.createDataFrame(
        [
            (1, "hash join merge stream"),
            (2, "hash aaaa bbbb cccc"),
            (3, "hash join " + "pad " * 30),
        ],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["score"] for r in retrieval.bm25_search(docs).collect()}
    assert got[1] > got[2]
    assert got[1] > got[3]


def test_bm25_plan_is_topk_not_full_sort(spark, sf_dir):
    plan = retrieval.bm25_search(_plain_docs(spark, sf_dir))._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # scoring never shuffles the corpus on a key
    assert "hashpartitioning(doc_id" not in plan


# --- winnow_fingerprints --------------------------------------------------------

def _winnow_py(text, k=5, w=4):
    s = " ".join(t for t in text.lower().split() if t)
    n = len(s) - k + 1
    if n <= 0:
        return set()
    hs = [int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:7], 16)
          for i in range(n)]
    n_win = 1 if n < w else n - w + 1
    out = set()
    for j in range(n_win):
        sl = hs[j:j + w]
        m = min(sl)
        pos = max(i for i, h in enumerate(sl, start=j) if h == m)
        out.add((pos + 1, m))
    return out


def test_winnow_matches_python_reference(spark, sf_dir):
    docs = _plain_docs(spark, sf_dir).limit(50)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in retrieval.winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for d, text in texts.items():
        assert got.get(d, set()) == _winnow_py(text), d


def test_winnow_guarantee_shared_substring_detected(spark):
    """Docs sharing a >= k+w-1-char normalized substring must share at
    least one fingerprint HASH (the winnowing detection guarantee)."""
    shared = "zebra quartz flux"  # 17 chars > k+w-1 = 8
    docs = spark.createDataFrame(
        [(1, "aaa " + shared + " bbb"), (2, "ccc ddd " + shared)],
        "doc_id: long, text: string",
    )
    rows = retrieval.winnow_fingerprints(docs).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_winnow_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "abcd"), (2, ""), (3, "abcde")], "doc_id: long, text: string"
    )
    rows = retrieval.winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert 1 not in by_doc  # 4 chars < k: no grams
    assert 2 not in by_doc
    assert by_doc[3] == [(1, _winnow_py("abcde").pop()[1])]


def test_winnow_is_pure_map(spark, sf_dir):
    plan = retrieval.winnow_fingerprints(_plain_docs(spark, sf_dir))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# --- bpe_top_merges --------------------------------------------------------------

def test_bpe_top_merges_hand_counts(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "cd CD x")], "doc_id: long, text: string"
    )
    rows = trainprep.bpe_top_merges(docs).collect()
    got = {r["pair"]: (r["n"], r["rank"]) for r in rows}
    # abab -> ab, ba, ab; ab -> ab; cd, cd (lowercased); x has no pair
    assert got["ab"] == (3, 1)
    assert got["cd"] == (2, 2)
    assert got["ba"] == (1, 3)
    assert len(rows) == 3


# --- rrf_fusion ----------------------------------------------------------------

def test_rrf_fusion_scores_and_ranks(spark, sf_dir):
    """RRF = 1/(60+lex) + 1/(60+sem) with 0 contribution for an absent
    list; union of both top-20 lists; rank is a dense total order."""
    docs = _plain_docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = retrieval.rrf_fusion(docs, emb).collect()

    lex = {r["doc_id"]: r["rank"]
           for r in retrieval.bm25_search(docs).collect()}
    assert rows, "fusion produced no rows"
    assert len(rows) <= 2 * retrieval.RRF_TOPK
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        exp = 0.0
        if r["lex_rank"] > 0:
            assert lex[r["doc_id"]] == r["lex_rank"]
            exp += 1.0 / (retrieval.RRF_C + r["lex_rank"])
        if r["sem_rank"] > 0:
            exp += 1.0 / (retrieval.RRF_C + r["sem_rank"])
        assert r["lex_rank"] > 0 or r["sem_rank"] > 0
        assert r["rrf"] == pytest.approx(round(exp, 9), abs=1e-12)
    # every lexical hit appears in the fused output
    assert set(lex) <= {r["doc_id"] for r in rows}
    # the query vector itself is sem rank 1 (cos = 1 with itself)
    top_sem = next(r for r in rows if r["sem_rank"] == 1)
    assert top_sem["doc_id"] == retrieval.RRF_QVEC


def test_rrf_dual_list_doc_outranks_single_list_peer(spark, sf_dir):
    """A doc present in both lists at rank r must outscore a doc present
    in only one list at the same rank r (monotonicity of fusion)."""
    docs = _plain_docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = retrieval.rrf_fusion(docs, emb).collect()
    both = [r for r in rows if r["lex_rank"] > 0 and r["sem_rank"] > 0]
    single = [r for r in rows if (r["lex_rank"] > 0) != (r["sem_rank"] > 0)]
    for b in both:
        for s in single:
            if max(b["lex_rank"], b["sem_rank"]) <= max(
                s["lex_rank"], s["sem_rank"]
            ):
                assert b["rrf"] > s["rrf"]


# --- inverted_postings -----------------------------------------------------------

def test_inverted_postings_matches_bruteforce(spark, sf_dir):
    """df/tf_total/top-cap postings agree with a pure-Python index;
    the salted two-level top-k is exact (not approximate)."""
    docs = _plain_docs(spark, sf_dir)
    rows = retrieval.inverted_postings(docs).collect()

    index = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r["text"].lower().split() if t]
        for t in set(toks):
            index.setdefault(t, {})[r["doc_id"]] = toks.count(t)
    got_terms = {r["term"] for r in rows}
    assert got_terms == set(index)
    for term, posts in index.items():
        mine = sorted(
            (r for r in rows if r["term"] == term),
            key=lambda r: r["post_rank"],
        )
        assert all(r["df"] == len(posts) for r in mine)
        assert all(r["tf_total"] == sum(posts.values()) for r in mine)
        exp = sorted(posts.items(), key=lambda kv: (-kv[1], kv[0]))
        exp = exp[: retrieval.POSTINGS_CAP]
        assert [(r["doc_id"], r["tf"]) for r in mine] == exp


# --- winnow_pairs ----------------------------------------------------------------

def test_winnow_pairs_matches_python_mirror(spark, sf_dir):
    """Pair counts equal a set-intersection rerun over the (df-capped)
    fingerprint sets; the shared-substring guarantee produces hits."""
    docs = _plain_docs(spark, sf_dir)
    fps = {}
    for r in retrieval.winnow_fingerprints(docs).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    n_docs = len(fps)
    from collections import Counter
    df = Counter(f for s in fps.values() for f in s)
    capped = {
        d: {f for f in s
            if df[f] <= retrieval.WINNOW_PAIR_MAX_DF_FRAC * n_docs}
        for d, s in fps.items()
    }
    ids = sorted(capped)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(capped[a] & capped[b])
            if n >= retrieval.WINNOW_PAIR_MIN_SHARED:
                exp[(a, b)] = n
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in retrieval.winnow_pairs(docs).collect()
    }
    assert got == exp
    assert got, "corpus should contain overlapping documents at test SF"
