"""Span-sequence fidelity fingerprint over the interleaved-span table.

The north rule requires the engine to *preserve span-sequence equality
(kind, text, media_ref, order) per doc_id* end-to-end. This operator
surfaces that invariant as a single hash-checked row per document: the
spans are re-ordered by their stored offset (NOT by array position, so
any accidental reordering upstream is caught), each span is rendered
to a canonical `kind|offset|media_ref|text` string, and the joined
sequence is md5-fingerprinted.

Geometry spans carry GeoJSON Feature text whose float formatting is
engine-specific (Java shortest-roundtrip vs DuckDB's printf), so the
canonical form re-derives the *content* exactly instead of hashing the
raw bytes: coordinates land back on the corpus's integer micro-degree
lattice (`round((lon+180)*1e6)` is exact — the stored double is within
1.3e-13 of the lattice point, ~6 orders of magnitude inside the 0.5
rounding margin), and properties come out of the JSON verbatim. Every
non-geometry span hashes its raw text bytes.

Scale path: pure map — JVM json path extraction + array_sort +
transform + md5 inside whole-stage codegen. No shuffle, no Python, no
data-sized state; the fingerprint column is 32 bytes/doc regardless of
document size.

Reference parity: geo-import never reorders features within an upsert
batch (es6-lib/lib/decoders/merger.js pipes layers in arrival order);
this is the same guarantee stated as a checkable per-document hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_span(x):
    """`kind|offset|media_ref|text` with geometry text canonicalized to
    the integer micro-degree lattice (engine-portable, float-format
    independent)."""
    lon = F.get_json_object(x["text"], "$.geometry.coordinates[0]").cast("double")
    lat = F.get_json_object(x["text"], "$.geometry.coordinates[1]").cast("double")
    geom_text = F.concat(
        F.lit("geom:"),
        F.round((lon + F.lit(180.0)) * F.lit(1000000.0), 0).cast("long").cast("string"),
        F.lit(":"),
        F.round((lat + F.lit(85.0)) * F.lit(1000000.0), 0).cast("long").cast("string"),
        F.lit(":"),
        F.get_json_object(x["text"], "$.properties.a_string"),
        F.lit(":"),
        F.get_json_object(x["text"], "$.properties.a_num"),
    )
    text = F.when(x["kind"] == "geometry", geom_text).otherwise(x["text"])
    # concat (not concat_ws): a NULL field must poison the fingerprint,
    # not silently vanish from it.
    return F.concat(
        x["kind"],
        F.lit("|"),
        x["offset"].cast("string"),
        F.lit("|"),
        x["media_ref"],
        F.lit("|"),
        text,
    )


def span_fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, n_spans, fp): md5 over the offset-ordered canonical
    span sequence. Two tables hold equal span sequences per doc_id iff
    their fingerprints match."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: a["offset"].cast("int") - b["offset"].cast("int")
    )
    seq = F.array_join(F.transform(ordered, _canonical_span), ";", "NULL")
    return documents.select(
        "doc_id",
        F.size("spans").cast("int").alias("n_spans"),
        F.md5(seq).alias("fp"),
    )


def caption_align(documents: DataFrame) -> DataFrame:
    """Multimodal caption alignment over interleaved spans: pair every
    media span with its nearest PRECEDING text span (the standard
    caption heuristic for interleaved web documents) and, for context,
    the nearest following one.

    Output: (doc_id, media_ref, media_offset, prev_text, next_text) —
    one row per media span; prev/next are NULL when no text span
    exists on that side.

    Plan: explode spans (map-side), then ONE doc_id shuffle feeding a
    single window sort that serves both the backward `last(ignore
    nulls)` and the forward `first(ignore nulls)` frame — the
    interleaved-document twin of the as-of join (temporal.py). Spans
    order by their STORED offset, not array position, per the
    north-rule sequence invariant.
    """
    from pyspark.sql import Window

    s = documents.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("media_offset"),
    )
    w = Window.partitionBy("doc_id").orderBy("media_offset")
    text_only = F.when(F.col("kind") == "text", F.col("text"))
    prev_t = F.last(text_only, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_t = F.first(text_only, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        s.withColumns({"prev_text": prev_t, "next_text": next_t})
        .filter(F.col("kind") == "media")
        .select("doc_id", "media_ref", "media_offset", "prev_text",
                "next_text")
    )


# Oracle: the corpus generator's closed form (corpus.documents span
# layout) — media spans exist for even keys at offset 2, always
# preceded by the order-text span and followed by the priority text
# span iff the key is also divisible by 3.
SQL_CAPTION_ALIGN = """
SELECT 'doc-' || CAST(o_orderkey AS VARCHAR) AS doc_id,
       'media://' || CAST((o_orderkey * 1103515245 + 12345) % 4294967296
                          AS VARCHAR) AS media_ref,
       CAST(2 AS INTEGER) AS media_offset,
       'order ' || CAST(o_orderkey AS VARCHAR) || ' ' || o_orderstatus
         AS prev_text,
       CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS next_text
FROM orders WHERE o_orderkey % 2 = 0
"""
