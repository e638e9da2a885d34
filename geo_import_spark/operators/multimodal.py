"""Multimodal (image/audio/video) span processing.

Media payloads are opaque refs/bytes with typed metadata. The Spark
plumbing — schema, Arrow batching via mapInPandas, partitioning — is
real and tested; the codec step is stubbed (no imaging libs in this
environment) behind two paths:

- `decode_stub=True` (default): a deterministic fake decode derived
  from md5(media_ref) — fully mirrored in the DuckDB oracle, so the
  whole pipeline is value-checked end to end.
- `decode_stub=False`: raises NotImplementedError where a real codec
  (PIL/ffmpeg) would run; swap-in is localized to `_decode_real`.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; media work is embarrassingly
parallel (no shuffle), so the operator inherits the input partitioning
(repartition upstream by doc_id if bytes are skewed).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("jpeg", "png", "webp")

FEATURE_SCHEMA = (
    "doc_id string, span_offset int, media_ref string, "
    "width int, height int, fmt string, n_frames int"
)


def _decode_fake(ref: str) -> tuple[int, int, str, int]:
    """Deterministic fake decode from md5(media_ref). The SQL mirror
    recomputes the identical values."""
    h = hashlib.md5(ref.encode()).hexdigest()
    width = 64 + int(h[0:4], 16) % 1856
    height = 64 + int(h[4:8], 16) % 1016
    fmt = FORMATS[int(h[8:12], 16) % 3]
    n_frames = 1 + int(h[12:16], 16) % 120 if fmt == "webp" else 1
    return width, height, fmt, n_frames


def _decode_real(ref: str):
    raise NotImplementedError(
        "real media decode requires an imaging/codec library; "
        "plug PIL/ffmpeg here"
    )


def media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media(doc_id, span_offset, media_ref) -> + (width, height, fmt,
    n_frames), batch-at-a-time over Arrow via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_fake if decode_stub else _decode_real
        for pdf in batches:
            feats = [decode(r) for r in pdf["media_ref"]]
            out = pdf[["doc_id", "span_offset", "media_ref"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["fmt"] = [f[2] for f in feats]
            out["n_frames"] = [f[3] for f in feats]
            yield out

    return media.select("doc_id", "span_offset", "media_ref").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_BOX = 256


def resize_plan(features: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """Aspect-preserving fit-in-box resize targets for each media item
    — the dimension planning half of a resize stage. The pixel
    resample itself belongs behind the same codec plug-point as
    `_decode_real` (another mapInPandas over binary columns); the
    TARGET geometry is pure integer arithmetic and stays JVM-side.

    The long side maps to `box` exactly; the short side scales as
    floor(short * box / long) — integer-exact in both engines (never
    `short * (box/long)`, whose rounded intermediate can floor-flip on
    exact multiples). Media already inside the box pass through
    unscaled (no upsampling).

    Output: features + (out_w, out_h, resized: boolean).
    """
    w, h = F.col("width"), F.col("height")
    fit_w = F.floor(w * box / F.greatest(w, h)).cast("int")
    fit_h = F.floor(h * box / F.greatest(w, h)).cast("int")
    needs = (w > box) | (h > box)
    return features.select(
        "*",
        F.when(needs, fit_w).otherwise(w).alias("out_w"),
        F.when(needs, fit_h).otherwise(h).alias("out_h"),
        needs.alias("resized"),
    )


def sql_resize_plan(features_sql: str, box: int = RESIZE_BOX) -> str:
    """DuckDB mirror over a features subquery (same columns as
    FEATURE_SCHEMA)."""
    return f"""
WITH f AS ({features_sql})
SELECT f.*,
       CAST(CASE WHEN width > {box} OR height > {box}
                 THEN floor(CAST(width * {box} AS DOUBLE) / GREATEST(width, height))
                 ELSE width END AS INTEGER) AS out_w,
       CAST(CASE WHEN width > {box} OR height > {box}
                 THEN floor(CAST(height * {box} AS DOUBLE) / GREATEST(width, height))
                 ELSE height END AS INTEGER) AS out_h,
       (width > {box} OR height > {box}) AS resized
FROM f
"""


def frame_sample(features: DataFrame, every_n: int = 30) -> DataFrame:
    """Sampled frame indices per media item (video-style spans):
    frames 0, every_n, 2*every_n, … < n_frames. Pure JVM explode —
    the per-frame decode itself would be another mapInPandas stage."""
    return features.select(
        "doc_id",
        "span_offset",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# --- SQL mirror of the stub decode -----------------------------------------

def sql_media_features(media_cte: str) -> str:
    """DuckDB mirror: `media_cte` must yield (doc_id, span_offset,
    media_ref)."""
    return f"""
WITH m AS ({media_cte}), h AS (
  SELECT doc_id, span_offset, media_ref, md5(media_ref) AS hx FROM m
)
SELECT doc_id, span_offset, media_ref,
       CAST(64 + CAST('0x' || substr(hx, 1, 4) AS BIGINT) % 1856 AS INTEGER) AS width,
       CAST(64 + CAST('0x' || substr(hx, 5, 4) AS BIGINT) % 1016 AS INTEGER) AS height,
       (['jpeg', 'png', 'webp'])[CAST('0x' || substr(hx, 9, 4) AS BIGINT) % 3 + 1] AS fmt,
       CAST(CASE WHEN (['jpeg', 'png', 'webp'])[CAST('0x' || substr(hx, 9, 4) AS BIGINT) % 3 + 1] = 'webp'
                 THEN 1 + CAST('0x' || substr(hx, 13, 4) AS BIGINT) % 120
                 ELSE 1 END AS INTEGER) AS n_frames
FROM h
"""
