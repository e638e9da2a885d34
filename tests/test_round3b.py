"""Round-3 additions: quality scoring, rolling-hash fingerprint,
embedding-cosine near-dup pairs, the applyInPandasWithState streaming
sessionizer, and the replace-flow schema-copy semantics
(reference: es6-lib/services/spatial.js:128-173 copySchema — a replace
drops the old columns, never merges)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_import_spark.operators import similarity, textops
from geo_import_spark.streaming import events as eventsmod
from geo_import_spark.streaming import stateful


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- quality score ----------------------------------------------------------

def test_quality_score_matches_python(spark, sf_dir):
    got = (
        textops.quality_score(_docs(spark, sf_dir))
        .orderBy("doc_id")
        .limit(20)
        .toPandas()
    )
    raw = _docs(spark, sf_dir).orderBy("doc_id").limit(20).toPandas()
    for g, text in zip(got.itertuples(), raw["text"]):
        toks = [t for t in text.lower().split() if t]
        assert g.n_chars == len(text)
        punct = sum(text.count(c) for c in ".,!?;:")
        assert g.punct_ratio == pytest.approx(punct / len(text))
        assert g.mean_token_len == pytest.approx(
            sum(len(t) for t in toks) / len(toks)
        )
        expect = (
            "too_short"
            if len(toks) < 5
            else ("gibberish" if sum(len(t) for t in toks) / len(toks) > 12.0 else "keep")
        )
        assert g.quality_class == expect


# --- rolling fingerprint ----------------------------------------------------

def _roll_py(text: str) -> int:
    h = 0
    for c in text:
        h = (h * textops.ROLL_BASE + ord(c)) % textops.ROLL_MOD
    return h


def test_rolling_fingerprint_matches_python(spark, sf_dir):
    got = (
        textops.rolling_fingerprint(_docs(spark, sf_dir))
        .orderBy("doc_id")
        .limit(10)
        .toPandas()
    )
    raw = _docs(spark, sf_dir).orderBy("doc_id").limit(10).toPandas()
    for g, text in zip(got["rolling_hash"], raw["text"]):
        assert int(g) == _roll_py(text)


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta alpha")], ["doc_id", "text"]
    )
    vals = {
        r["doc_id"]: r["rolling_hash"]
        for r in textops.rolling_fingerprint(df).collect()
    }
    # md5-of-tokens fingerprints differ too, but rolling hash must
    # distinguish reordered content as well
    assert vals["a"] != vals["b"]


# --- embedding near-dups ----------------------------------------------------

def test_embedding_near_dups_are_true_positives(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.embedding_near_dups(emb, threshold=0.35).toPandas()
    assert len(pairs) > 0
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for a, b in pairs.itertuples(index=False):
        assert a < b
        va, vb = vecs[a], vecs[b]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos >= 0.35 - 1e-12

    # every emitted pair is also a brute-force near-dup pair; the LSH
    # join may MISS cross-bucket pairs (documented recall tradeoff)
    ids = sorted(vecs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            if va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.35:
                brute.add((a, b))
    got = {(a, b) for a, b in pairs.itertuples(index=False)}
    assert got <= brute
    # 0.35 is far below the near-dup regime (p_band ~= 2% per band at
    # cos 0.35), so corpus recall here is the documented smooth-decay
    # tail, ~20% with b=8 bands; the planted-twin test below covers
    # the >=0.9 regime the operator is designed for (~94% expected).
    assert len(got) >= len(brute) // 8


def test_embedding_near_dups_high_recall_on_planted_twins(spark):
    """Design-regime recall: every vector gets a perturbed twin with
    cos >= 0.9; banded LSH (b=8 bands x r=8 planes) must recover the
    planted pairs at ~1-(1-p^r)^b ~= 94% expected recall."""
    rng = np.random.default_rng(7)
    rows = []
    planted = set()
    for i in range(60):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        noise = rng.normal(size=64) * 0.04  # |noise| ~= 0.32 => cos ~= 0.95
        twin = base + noise
        twin /= np.linalg.norm(twin)
        cos = float(base @ twin)
        assert cos >= 0.9, cos
        a, b = 2 * i, 2 * i + 1
        rows.append((a, [float(x) for x in base]))
        rows.append((b, [float(x) for x in twin]))
        planted.add((a, b))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in similarity.embedding_near_dups(emb, threshold=0.9).collect()
    }
    hits = got & planted
    assert len(hits) >= int(0.75 * len(planted)), (len(hits), len(planted))
    # and nothing emitted below the threshold
    vecs = {vid: np.asarray(v) for vid, v in rows}
    for a, b in got:
        assert float(vecs[a] @ vecs[b]) >= 0.9 - 1e-12


# --- stateful streaming sessionizer ----------------------------------------

def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = stateful.sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM closed_sessions"
    ).toPandas()

    batch = eventsmod.sessionize(events, gap_minutes=30).toPandas()
    # streaming emits only CLOSED sessions: every user's final session
    # is still open in the state store at end of input
    last = batch.sort_values("session_id").groupby("user_id").tail(1)
    expected = (
        pd.concat([batch, last])
        .drop_duplicates(keep=False)[
            ["user_id", "session_start", "session_end", "n_events"]
        ]
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(expected)
    pd.testing.assert_frame_equal(
        got, expected, check_dtype=False, check_exact=True
    )


# --- replace-flow schema-copy semantics -------------------------------------

def test_overwrite_commit_drops_old_columns(spark, tmp_path):
    from geo_import_spark.plans.table import Table

    t = Table(str(tmp_path / "tbl"))
    t.commit(spark, spark.createDataFrame([(1, "x")], ["a", "b"]))
    assert set(t.read(spark).columns) == {"a", "b"}

    # replace with a changed schema: old column b must be GONE, not
    # merged (reference copySchema semantics, spatial.js:128-173)
    t.commit(spark, spark.createDataFrame([(2, 9.5)], ["a", "c"]), mode="overwrite")
    out = t.read(spark)
    assert set(out.columns) == {"a", "c"}
    assert out.collect()[0]["a"] == 2
    # the snapshot history still holds the pre-replace schema
    assert len(t.snapshots()) == 2
