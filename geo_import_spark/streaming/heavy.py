"""Streaming heavy-hitter candidates: sharded Misra-Gries summaries
kept in the state store (applyInPandasWithState), the streaming twin
of textops.heavy_hitters' batch prefilter.

Every term routes to exactly one shard (hash mod NSHARDS), so a term
globally heavier than N_shard/(k+1) is heavy within its shard's
substream and provably survives that shard's summary — the same
pigeonhole as the per-partition batch argument, with the partition
replaced by the keyed state. State is NSHARDS x k counters TOTAL,
independent of stream length or vocabulary; each micro-batch shuffles
only its own tokens (one exchange on shard). Output mode is UPDATE:
each micro-batch re-emits the shards it touched with their current
candidate summaries.

Exactness contract: like the batch prefilter, the summary is a
candidate GENERATOR (no false negatives above the bound, possible
false positives); the exact-count verify pass is batch
heavy_hitters' second stage and applies unchanged to a snapshot.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_import_spark.operators.textops import mg_merge

HH_SHARDS = 8
HH_STATE_K = 64

OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("est", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _hh_fn(k: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            terms, counts = state.get
            counters = pd.Series(
                list(counts), index=list(terms), dtype="int64"
            )
        else:
            counters = pd.Series(dtype="int64")
        for pdf in pdfs:
            counters = mg_merge(counters, pdf["term"], k)
        state.update(
            (list(counters.index), [int(c) for c in counters])
        )
        yield pd.DataFrame(
            {
                "shard": shard,
                "term": counters.index,
                "est": counters.astype("int64").to_numpy(),
            }
        )

    return fn


def shard_col(term_col):
    """The shard route — deterministic within a Spark session (xxhash64)."""
    return F.pmod(F.xxhash64(term_col), F.lit(HH_SHARDS))


def streaming_hh_candidates(tokens: DataFrame,
                            k: int = HH_STATE_K) -> DataFrame:
    """tokens(term string, streaming) -> per-shard Misra-Gries
    candidate summaries, updated every micro-batch."""
    keyed = tokens.withColumn("shard", shard_col(F.col("term")))
    return keyed.groupBy("shard").applyInPandasWithState(
        _hh_fn(k),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
