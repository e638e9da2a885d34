"""Streaming exact deduplication with bounded state.

The batch dedup family (operators/textops.exact_dedup,
operators/dedup.*) answers "which documents are duplicates"; a
streaming ingest pipeline needs the complementary gate: "drop this
arriving document iff its content was already seen", with state that
does NOT grow forever. `dropDuplicatesWithinWatermark` keeps one state
row per content hash and evicts it once the event-time watermark
passes — the standard bounded-state contract: exact dedup within the
watermark horizon, at-most-once state per hash, O(horizon x ingest
rate) state instead of O(corpus).

Keying on md5(text) instead of text keeps state rows at 32 bytes
regardless of document size — the same trick exact_dedup uses for its
shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(documents: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """documents stream with an event-time `ts` column -> the stream
    with exact-content duplicates dropped within `horizon`.

    Works on batch frames too (dropDuplicatesWithinWatermark requires a
    stream; the batch twin is dropDuplicates on the same key — tested
    equivalent for in-horizon duplicates).
    """
    hashed = documents.withColumn("text_hash", F.md5("text"))
    with_wm = hashed.withWatermark("ts", horizon)
    if documents.isStreaming:
        return with_wm.dropDuplicatesWithinWatermark(["text_hash"])
    return hashed.dropDuplicates(["text_hash"])
