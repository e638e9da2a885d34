"""Semantic tests for spans.caption_align: window edge cases the
corpus layout (media always mid-document) doesn't reach."""

from geo_import_spark.operators import spans as spansmod

SCHEMA = (
    "doc_id string, spans array<struct<kind:string, text:string,"
    "media_ref:string, offset:int>>"
)


def _doc(doc_id, seq):
    """seq: list of (kind, text, media_ref); offsets = positions,
    stored SHUFFLED in the array to prove ordering uses the offset
    field, not array position."""
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(seq)
    ]
    spans = spans[1:] + spans[:1]  # rotate: array order != offset order
    return (doc_id, spans)


def test_caption_align_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            # media first: no preceding text
            _doc("lead", [("media", "", "m0"), ("text", "after", "")]),
            # consecutive media share the same neighbors
            _doc("pair", [
                ("text", "intro", ""),
                ("media", "", "m1"),
                ("media", "", "m2"),
                ("text", "outro", ""),
            ]),
            # trailing media: no following text
            _doc("tail", [("text", "only", ""), ("media", "", "m3")]),
            # media-only doc: both sides NULL
            _doc("bare", [("media", "", "m4"), ("media", "", "m5")]),
            # geometry spans are NOT captions
            _doc("geo", [
                ("text", "cap", ""),
                ("geometry", '{"type":"Feature"}', ""),
                ("media", "", "m6"),
            ]),
        ],
        SCHEMA,
    )
    got = {
        r.media_ref: (r.doc_id, r.media_offset, r.prev_text, r.next_text)
        for r in spansmod.caption_align(docs).collect()
    }
    assert got["m0"] == ("lead", 0, None, "after")
    assert got["m1"] == ("pair", 1, "intro", "outro")
    assert got["m2"] == ("pair", 2, "intro", "outro")
    assert got["m3"] == ("tail", 1, "only", None)
    assert got["m4"] == ("bare", 0, None, None)
    assert got["m5"] == ("bare", 1, None, None)
    # the geometry span between cap and media must be skipped, and
    # the nearest preceding TEXT found behind it
    assert got["m6"] == ("geo", 2, "cap", None)
    assert len(got) == 7
