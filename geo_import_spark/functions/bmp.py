"""Pure-NumPy BMP (Windows bitmap) codec — the one REAL codec behind
the multimodal plug-point.

The container has no imaging libraries, so exotic codecs (JPEG/PNG/
WebP) stay honestly stubbed in `operators/multimodal.py`; BMP is
uncompressed and fully specified by ~40 lines of header math, so the
engine decodes it for real: `media_pixel_stats` runs this decoder over
generated BMP bytes and its DuckDB oracle recomputes the same pixel
sums from the generation formula — end-to-end value-checked through a
genuine binary parse.

Format implemented: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
(40 bytes), 24-bit BI_RGB, rows padded to 4-byte boundaries, stored
bottom-up (positive height) or top-down (negative height), pixels in
BGR byte order. That is the overwhelmingly common BMP-on-disk layout.

Reference parity note: geo-import treats media as opaque refs
(es6-lib has no codecs at all); this module is part of the
training-data-pipeline surface the Spark engine adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")   # magic, file size, res1, res2, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, imgsize, ppm x/y, clr used/important

HEADER_BYTES = _FILE_HEADER.size + _INFO_HEADER.size  # 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3*width rounded up to a 4-byte multiple."""
    return (width * 3 + 3) & ~3


def encode_bmp(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> bytes:
    """Encode three (h, w) uint8 channel planes as a 24-bit BI_RGB BMP.

    Rows are written bottom-up with BGR byte order and 4-byte padding —
    byte-for-byte what a stock Windows bitmap writer produces.
    """
    r = np.asarray(r, dtype=np.uint8)
    if r.ndim != 2:
        raise ValueError("channel planes must be 2-D (h, w)")
    if not (r.shape == np.shape(g) == np.shape(b)):
        raise ValueError("channel planes must share one (h, w) shape")
    h, w = r.shape
    stride = row_stride(w)
    # Interleave to BGR, pad each row, flip to bottom-up storage order.
    px = np.zeros((h, stride), dtype=np.uint8)
    inter = np.stack([b, g, r], axis=-1).reshape(h, w * 3)
    px[:, : w * 3] = inter
    body = px[::-1].tobytes()
    size = HEADER_BYTES + len(body)
    return (
        _FILE_HEADER.pack(b"BM", size, 0, 0, HEADER_BYTES)
        + _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a 24-bit BI_RGB BMP -> (width, height, r, g, b) planes.

    A real parser, not a fixture replay: validates the magic, walks the
    declared pixel-data offset (palettes/gap bytes between header and
    pixels are skipped correctly), honours row padding, and handles
    both bottom-up (h > 0) and top-down (h < 0) row order.
    """
    if len(data) < HEADER_BYTES:
        raise ValueError("truncated BMP: shorter than the 54-byte headers")
    magic, _fsize, _r1, _r2, data_off = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (hdr_size, w, h_signed, planes, bpp, comp, _imgsz, _px, _py, _cu, _ci) = (
        _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} compression={comp} "
            "(only 24-bit BI_RGB is implemented)"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h_signed}")
    stride = row_stride(w)
    need = data_off + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    # Stored BGR -> logical R, G, B planes.
    return w, h, rows[..., 2].copy(), rows[..., 1].copy(), rows[..., 0].copy()
