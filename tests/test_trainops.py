"""Semantic tests for the training-data pipeline operators (beyond
the oracle parity in test_oracle_parity.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import dedup, multimodal, similarity
from geo_import_spark.streaming import events as eventsmod


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


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
    feats = multimodal.media_features(media).cache()
    frames = multimodal.frame_sample(feats, every_n=30).toPandas()
    f = feats.toPandas()
    import numpy as np

    exp = int(np.ceil(f["n_frames"].values / 30).sum())
    assert len(frames) == exp
    assert (frames["frame_idx"] % 30 == 0).all()
    only_webp_multi = f[f["fmt"] != "webp"]["n_frames"]
    assert (only_webp_multi == 1).all()


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
