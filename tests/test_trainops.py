"""Semantic tests for the training-data pipeline operators (beyond
the oracle parity in test_oracle_parity.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import dedup, multimodal, similarity, textops
from geo_import_spark.streaming import events as eventsmod


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # unpersist on teardown (shared-session cache hygiene — see
    # test_flagship.docs)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_lsh_recall_of_high_jaccard_pairs(docs):
    """Every near-identical pair (3-gram Jaccard >= 0.8) must be an
    LSH candidate — banding (4x4 over 16 perms) makes a miss at
    j=0.8 astronomically unlikely; the corpus plants ~25 such pairs."""
    truth = dedup.ngram_jaccard_pairs(docs, threshold=0.8).toPandas()
    cand = dedup.minhash_lsh_pairs(docs).toPandas()
    assert len(truth) > 0
    got = set(zip(cand["doc_a"], cand["doc_b"]))
    missing = [p for p in zip(truth["doc_a"], truth["doc_b"]) if p not in got]
    assert not missing, missing


def test_lsh_precision_against_jaccard(docs):
    """LSH candidates should overwhelmingly be genuinely similar —
    with 4-row bands, random collisions are ~(1/2^28)^4."""
    cand = dedup.minhash_lsh_pairs(docs)
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    n_cand = cand.count()
    n_good = cand.join(jac, ["doc_a", "doc_b"]).count()
    assert n_good >= 0.9 * n_cand


def test_ann_rank1_is_self(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = similarity.cosine_topk(emb, n_queries=5, k=3).toPandas()
    r1 = top[top["rank"] == 1]
    assert (r1["query_id"].values == r1["vec_id"].values).all()
    assert len(top) == 15


def test_hot_shingle_df_cap_bounds_pair_blowup(spark):
    """N docs sharing one boilerplate sentence: without the df cap the
    shingle self-join yields ~N^2/2 pairs; with the cap (df > 1% of
    docs) the hot shingles never enter the join."""
    boiler = "all rights reserved contact us for more information today"
    rows = [(f"b-{i}", f"{boiler} unique{i} token{i} extra{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df_frac=None)
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df_frac=0.05)
    assert uncapped.count() == 40 * 39 // 2  # quadratic: every pair shares boilerplate
    assert capped.count() == 0  # hot shingles dropped before the join


def test_ann_lsh_topk_recall_on_near_duplicates(spark):
    """Completed LSH ANN path: planted near-duplicate vectors (base +
    1% noise) land in the same or a Hamming-1 bucket, so multi-probe
    candidate generation + exact re-rank recovers them."""
    import numpy as np

    rng = np.random.default_rng(42)
    n_clusters, copies = 20, 3
    base = rng.normal(size=(n_clusters, similarity.DIM))
    rows = []
    for c in range(n_clusters):
        rows.append((c, base[c].astype(float).tolist()))
        for j in range(1, copies + 1):
            noisy = base[c] + 0.01 * rng.normal(size=similarity.DIM)
            rows.append((c + 100 * j, noisy.astype(float).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.lsh_topk(emb, n_queries=n_clusters, k=copies + 1).toPandas()
    found = set(zip(got["query_id"], got["vec_id"]))
    planted = [
        (c, c + 100 * j) for c in range(n_clusters) for j in range(1, copies + 1)
    ]
    recall = sum(p in found for p in planted) / len(planted)
    assert recall >= 0.9, recall
    r1 = got[got["rank"] == 1]
    assert (r1["query_id"].values == r1["vec_id"].values).all()


def test_ann_lsh_topk_subset_of_bruteforce_order(spark, sf_dir):
    """On the corpus: every (query, vec) the ANN path returns must be
    ranked consistently with the exact cosine order (the re-rank is
    exact; only candidate generation is approximate)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, n_queries=5, k=500).toPandas()
    ann = similarity.lsh_topk(emb, n_queries=5, k=10).toPandas()
    exact_rank = {(q, v): r for q, v, r in exact.itertuples(index=False)}
    for q in sorted(ann["query_id"].unique()):
        sub = ann[ann["query_id"] == q].sort_values("rank")
        ex = [exact_rank[(q, v)] for v in sub["vec_id"]]
        assert ex == sorted(ex)  # ANN order == exact cosine order
        assert sub.iloc[0]["vec_id"] == q  # self is always a candidate


def test_media_real_decode_raises(spark, sf_dir):
    from geo_import_spark import corpus
    from geo_import_spark.operators import tiling

    media = tiling.media_spans(corpus.documents(spark, sf_dir)).limit(4)
    with pytest.raises(Exception) as ei:
        multimodal.media_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample(spark, sf_dir):
    from geo_import_spark import corpus
    from geo_import_spark.operators import tiling

    media = tiling.media_spans(corpus.documents(spark, sf_dir))
    import numpy as np

    feats = multimodal.media_features(media).cache()
    try:
        frames = multimodal.frame_sample(feats, every_n=30).toPandas()
        f = feats.toPandas()
        exp = int(np.ceil(f["n_frames"].values / 30).sum())
        assert len(frames) == exp
        assert (frames["frame_idx"] % 30 == 0).all()
        only_webp_multi = f[f["fmt"] != "webp"]["n_frames"]
        assert (only_webp_multi == 1).all()
    finally:
        feats.unpersist()


def test_sessionize_partitions_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = eventsmod.sessionize(ev, gap_minutes=30).toPandas()
    assert sess["n_events"].sum() == ev.count()
    assert (sess["session_start"] <= sess["session_end"]).all()
    # sessions of one user don't overlap (gap > limit between them)
    for _, g in sess.groupby("user_id"):
        g = g.sort_values("session_id")
        ends = g["session_end"].values[:-1]
        starts = g["session_start"].values[1:]
        assert (
            (pd.to_datetime(starts) - pd.to_datetime(ends)).total_seconds()
            > 30 * 60
        ).all() if len(g) > 1 else True


# --- heavy_hitters ---------------------------------------------------------------

def test_heavy_hitters_exact_vs_bruteforce(spark, sf_dir):
    """Output = EXACTLY the phi-heavy terms with exact counts (the MG
    prefilter may not drop a heavy term or corrupt a count)."""
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = textops.heavy_hitters(docs).collect()

    c = Counter()
    for r in docs.select("text").collect():
        c.update(t for t in r["text"].lower().split() if t)
    total = sum(c.values())
    exp = {t: n for t, n in c.items() if n > textops.HH_PHI * total}
    assert {r["term"]: r["cnt"] for r in rows} == exp
    assert exp, "corpus should contain heavy terms at test SF"
    for r in rows:
        assert r["frac"] == r["cnt"] / total


def test_mg_candidates_superset_under_tiny_summary(spark, sf_dir):
    """Even with a deliberately tiny sketch (k=8 >= 1/phi - 1 for
    phi=0.2), every phi-heavy term survives the prefilter."""
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(textops.tokens_col(F.col("text"))).alias("term")
    )
    cand = {
        r["term"] for r in textops._mg_candidates(toks, 8).distinct().collect()
    }
    c = Counter()
    for r in docs.select("text").collect():
        c.update(t for t in r["text"].lower().split() if t)
    total = sum(c.values())
    heavy = {t for t, n in c.items() if n > total / 9}  # N/(k+1)
    assert heavy <= cand
