"""Multimodal (image/audio/video) span processing.

Media payloads are opaque refs/bytes with typed metadata. The Spark
plumbing — schema, Arrow batching via mapInPandas, partitioning — is
real and tested; the codec step is stubbed (no imaging libs in this
environment) behind two paths:

- `decode_stub=True` (default): a deterministic fake decode derived
  from md5(media_ref) — fully mirrored in the DuckDB oracle, so the
  whole pipeline is value-checked end to end.
- `decode_stub=False`: dispatches on the payload bytes — BMP decodes
  for REAL via the pure-NumPy codec in `functions/bmp.py`
  (`media_pixel_stats` below runs it end-to-end under an oracle);
  compressed codecs (JPEG/PNG/WebP) raise NotImplementedError where
  PIL/ffmpeg would plug in. Swap-in stays localized to `_decode_real`.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; media work is embarrassingly
parallel (no shuffle), so the operator inherits the input partitioning
(repartition upstream by doc_id if bytes are skewed).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_import_spark.functions import bmp

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


def _decode_real(data: bytes) -> tuple[int, int, str, int]:
    """Real decode over payload BYTES (not refs). BMP is implemented
    in pure NumPy (`functions/bmp.py`); compressed codecs remain the
    honest stub — plug PIL/ffmpeg here."""
    if isinstance(data, (bytes, bytearray)) and data[:2] == b"BM":
        w, h, _r, _g, _b = bmp.decode_bmp(bytes(data))
        return w, h, "bmp", 1
    raise NotImplementedError(
        "real media decode beyond BMP requires an imaging/codec "
        "library; plug PIL/ffmpeg here"
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


# --- Real-codec path: generated BMP bytes -> decoded pixel stats -----------

PIXEL_STATS_SCHEMA = (
    "doc_id string, span_offset int, width int, height int, "
    "n_pixels bigint, sum_r bigint, sum_g bigint, sum_b bigint"
)


def _bmp_dims(n: int) -> tuple[int, int]:
    """Deterministic small dimensions from the media ref's numeric id
    (mirrored literally in the SQL oracle)."""
    return 4 + n % 29, 4 + (n // 29) % 13


def _bmp_planes(n: int, w: int, h: int):
    """Pixel formula R=(7x+3y+n)%256, G=+11, B=+22 — closed-form so
    the oracle can recompute the sums without a decoder."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    base = x * 7 + y * 3 + n
    return (
        (base % 256).astype(np.uint8),
        ((base + 11) % 256).astype(np.uint8),
        ((base + 22) % 256).astype(np.uint8),
    )


def synthesize_bmp(media: DataFrame) -> DataFrame:
    """Blob-fetch stand-in: attach real, spec-conformant BMP bytes to
    each media span, derived deterministically from the ref's numeric
    id. In production this stage is `spark.read.format("binaryFile")`
    or a blob-store fetch; the *downstream* decode is identical either
    way, which is the point — the decoder sees genuine BMP bytes it
    must actually parse (headers, BGR order, row padding, bottom-up
    rows). Output: media + media_bytes binary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ref in pdf["media_ref"]:
                n = int(str(ref).rsplit("//", 1)[-1])
                w, h = _bmp_dims(n)
                blobs.append(bmp.encode_bmp(*_bmp_planes(n, w, h)))
            out = pdf[["doc_id", "span_offset", "media_ref"]].copy()
            out["media_bytes"] = blobs
            yield out

    return media.select("doc_id", "span_offset", "media_ref").mapInPandas(
        run,
        schema="doc_id string, span_offset int, media_ref string, media_bytes binary",
    )


def media_pixel_stats(media_with_bytes: DataFrame) -> DataFrame:
    """REAL decode path: parse the BMP payload of every media span and
    emit exact integer pixel statistics (per-channel sums, so the
    result hashes stably — means are sums/n_pixels downstream).

    Scale shape: mapInPandas over Arrow batches, no shuffle, constant
    memory per task (one image in flight per row); inherits upstream
    partitioning. The decode is `functions/bmp.decode_bmp` — a genuine
    header-walking parser, not a replay of the generation formula.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sr, sg, sb = [], [], [], [], []
            for blob in pdf["media_bytes"]:
                w, h, r, g, b = bmp.decode_bmp(bytes(blob))
                ws.append(w)
                hs.append(h)
                sr.append(int(r.sum(dtype=np.int64)))
                sg.append(int(g.sum(dtype=np.int64)))
                sb.append(int(b.sum(dtype=np.int64)))
            out = pdf[["doc_id", "span_offset"]].copy()
            out["width"] = ws
            out["height"] = hs
            out["n_pixels"] = [w * h for w, h in zip(ws, hs)]
            out["sum_r"] = sr
            out["sum_g"] = sg
            out["sum_b"] = sb
            yield out

    return media_with_bytes.select(
        "doc_id", "span_offset", "media_bytes"
    ).mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def sql_media_pixel_stats(media_n_cte: str) -> str:
    """DuckDB mirror: `media_n_cte` must yield (doc_id, span_offset,
    n) where n is the ref's numeric id. Recomputes the pixel sums from
    the generation formula via staged unnest(range()) expansion — the Spark
    side arrives at the same integers only by correctly encoding AND
    decoding real BMP bytes."""
    return f"""
WITH m AS ({media_n_cte}), dims AS (
  SELECT doc_id, span_offset, n,
         CAST(4 + n % 29 AS INTEGER) AS width,
         CAST(4 + (n // 29) % 13 AS INTEGER) AS height
  FROM m
), xs AS (
  SELECT doc_id, span_offset, n, width, height,
         unnest(range(0, width)) AS x
  FROM dims
), px AS (
  SELECT doc_id, span_offset, width, height,
         (x * 7 + unnest(range(0, height)) * 3 + n) % 256 AS r,
         (x * 7 + unnest(range(0, height)) * 3 + n + 11) % 256 AS g,
         (x * 7 + unnest(range(0, height)) * 3 + n + 22) % 256 AS b
  FROM xs
)
SELECT doc_id, span_offset, width, height,
       CAST(width AS BIGINT) * height AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, span_offset, width, height
"""


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


# --- Perceptual hash (aHash) over real decoded pixels -----------------------

def _ahash16(r: np.ndarray) -> int:
    """16-bit average hash of one channel plane: 4x4 block means vs
    the global mean, bit (by*4+bx) set when the block is brighter.
    Exact integer compare (block_sum * n_pixels > total * block_n) —
    no float means, so the SQL mirror lands on identical bits."""
    h_, w_ = r.shape
    bx = (np.arange(w_, dtype=np.int64) * 4) // w_
    by = (np.arange(h_, dtype=np.int64) * 4) // h_
    bs = np.zeros((4, 4), dtype=np.int64)
    np.add.at(bs, (by[:, None], bx[None, :]), r.astype(np.int64))
    bn = np.bincount(by, minlength=4)[:, None] * np.bincount(bx, minlength=4)[None, :]
    total = int(r.sum(dtype=np.int64))
    npix = h_ * w_
    bits = (bs * npix) > (total * bn)
    idx = (np.arange(4)[:, None] * 4 + np.arange(4)[None, :]).astype(np.int64)
    return int(((1 << idx) * bits).sum())


def media_ahash(media_with_bytes: DataFrame) -> DataFrame:
    """Perceptual hash per media span: decode the real BMP payload and
    compute the classic average hash (aHash) on the R plane — a 4x4
    block grid (the corpus floor is 4x4 images), each bit = block mean
    above the global mean, resolution-invariant by construction.

    Scale shape: mapInPandas over Arrow batches, no shuffle, one image
    in flight per row; same plan as media_pixel_stats with a different
    per-image fold. Output: (doc_id, span_offset, ahash BIGINT).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for blob in pdf["media_bytes"]:
                _w, _h, r, _g, _b = bmp.decode_bmp(bytes(blob))
                hashes.append(_ahash16(r))
            out = pdf[["doc_id", "span_offset"]].copy()
            out["ahash"] = pd.Series(hashes, dtype="int64")
            yield out

    return media_with_bytes.select(
        "doc_id", "span_offset", "media_bytes"
    ).mapInPandas(run, schema="doc_id string, span_offset int, ahash bigint")


def media_ahash_groups(media_with_bytes: DataFrame) -> DataFrame:
    """Near-dup image dedup by exact perceptual-hash match: images
    whose aHash collides are visually-similar candidates (identical
    block-brightness pattern); one representative per group survives.

    Output: (ahash, n_imgs, min_doc) for groups of >= 2, the
    dedup_exact contract transplanted to decoded pixels. Plan: the
    map-only decode above + ONE map-side-combined aggregate keyed by
    the 16-bit hash (bounded output: <= 65536 groups) — group sizes
    may be large but the aggregate is a count/min fold, never a
    within-group pair join, so hot hashes (smooth gradients collide a
    lot) cost nothing extra.
    """
    return (
        media_ahash(media_with_bytes)
        .groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("n_imgs") >= 2)
    )


def sql_media_ahash_groups(media_n_cte: str) -> str:
    """DuckDB mirror: recompute the aHash from the pixel-generation
    formula (never from bytes) — Spark only matches by correctly
    decoding the BMP it encoded, same proof shape as
    sql_media_pixel_stats."""
    return f"""
WITH m AS ({media_n_cte}), dims AS (
  SELECT doc_id, span_offset, n,
         CAST(4 + n % 29 AS INTEGER) AS width,
         CAST(4 + (n // 29) % 13 AS INTEGER) AS height
  FROM m
), xs AS (
  SELECT doc_id, span_offset, n, width, height,
         unnest(range(0, width)) AS x
  FROM dims
), px AS (
  SELECT doc_id, span_offset, n, width, height, x,
         unnest(range(0, height)) AS y
  FROM xs
), rp AS (
  SELECT doc_id, span_offset, width, height,
         (x * 4) // width AS bx, (y * 4) // height AS by,
         (x * 7 + y * 3 + n) % 256 AS r
  FROM px
), bsum AS (
  SELECT doc_id, span_offset, width, height, bx, by,
         SUM(r) AS bs, COUNT(*) AS bn
  FROM rp GROUP BY ALL
), tot AS (
  SELECT doc_id, span_offset, SUM(r) AS total, COUNT(*) AS npix
  FROM rp GROUP BY ALL
), ah AS (
  SELECT b.doc_id, b.span_offset,
         CAST(SUM(CASE WHEN b.bs * t.npix > t.total * b.bn
                       THEN 1 << (b.by * 4 + b.bx) ELSE 0 END) AS BIGINT)
           AS ahash
  FROM bsum b JOIN tot t USING (doc_id, span_offset)
  GROUP BY b.doc_id, b.span_offset
)
SELECT ahash, COUNT(*) AS n_imgs, MIN(doc_id) AS min_doc
FROM ah GROUP BY ahash HAVING COUNT(*) >= 2
"""
