"""Streaming Misra-Gries heavy-hitter candidates: the no-false-
negative guarantee vs the batch-exact counts, bounded state, and
snapshot consistency with the batch prefilter math."""

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from geo_import_spark.operators import textops
from geo_import_spark.streaming import heavy


def test_streaming_candidates_contain_every_heavy_term(
    spark, sf_dir, tmp_path
):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(textops.tokens_col(F.col("text"))).alias("term")
    )
    src = str(tmp_path / "tokens")
    # several files => several micro-batches via maxFilesPerTrigger
    toks.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = heavy.streaming_hh_candidates(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_candidates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    snap = spark.sql("SELECT shard, term, est FROM hh_candidates").toPandas()
    assert not snap.empty
    cand = set(snap["term"])

    c = Counter()
    for r in docs.select("text").collect():
        c.update(t for t in r["text"].lower().split() if t)
    total = sum(c.values())
    # per-shard guarantee: count > N_shard/(k+1); bound conservatively
    # by the GLOBAL N/(k+1) (N_shard <= N)
    heavy_terms = {
        t for t, n in c.items() if n > total / (heavy.HH_STATE_K + 1)
    }
    assert heavy_terms, "test corpus should have heavy terms"
    assert heavy_terms <= cand
    # bounded state: each shard's summary holds <= k terms per update
    per_shard = snap.groupby("shard")["term"].nunique()
    assert (per_shard <= heavy.HH_STATE_K).all()
    # estimates never exceed the true counts (MG only undercounts)
    finals = snap.drop_duplicates(["shard", "term"], keep="last")
    for _, r in finals.iterrows():
        assert r["term"] in c and r["est"] <= c[r["term"]]
