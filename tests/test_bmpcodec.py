"""BMP codec (functions/bmp.py) + the real-decode media_pixel_stats
pipeline (operators/multimodal.py).

The codec tests are Spark-free: they pin the on-disk byte layout
(headers, BGR order, bottom-up rows, 4-byte padding) against
hand-computed literals, so encode/decode can't agree on a *wrong*
layout and still round-trip.
"""

import struct

import numpy as np
import pytest

from geo_import_spark.functions import bmp


def _planes(w, h, seed=0):
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    base = x * 7 + y * 3 + seed
    return (
        (base % 256).astype(np.uint8),
        ((base + 11) % 256).astype(np.uint8),
        ((base + 22) % 256).astype(np.uint8),
    )


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (4, 4), (5, 3), (31, 7), (32, 1)])
def test_roundtrip_all_padding_classes(w, h):
    # w in {1,2,3,5,31} exercises every row-padding remainder (3w % 4).
    r, g, b = _planes(w, h, seed=w * 1000 + h)
    data = bmp.encode_bmp(r, g, b)
    w2, h2, r2, g2, b2 = bmp.decode_bmp(data)
    assert (w2, h2) == (w, h)
    np.testing.assert_array_equal(r2, r)
    np.testing.assert_array_equal(g2, g)
    np.testing.assert_array_equal(b2, b)


def test_byte_layout_pinned():
    # 2x2 image, distinct channel values per pixel; verify the exact
    # file bytes, not just a self-consistent round trip.
    r = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    g = np.array([[11, 21], [31, 41]], dtype=np.uint8)
    b = np.array([[12, 22], [32, 42]], dtype=np.uint8)
    data = bmp.encode_bmp(r, g, b)
    assert data[:2] == b"BM"
    fsize, off = struct.unpack_from("<I", data, 2)[0], struct.unpack_from("<I", data, 10)[0]
    assert off == 54
    # stride = (2*3+3)&~3 = 8; body = 2 rows * 8 = 16; file = 54+16 = 70
    assert fsize == 70 and len(data) == 70
    hdr = struct.unpack_from("<IiiHHI", data, 14)
    assert hdr == (40, 2, 2, 1, 24, 0)
    body = data[54:]
    # Bottom-up: stored row 0 is image row 1 (y=1), BGR per pixel, 2 pad bytes.
    assert body[:8] == bytes([32, 31, 30, 42, 41, 40, 0, 0])
    assert body[8:] == bytes([12, 11, 10, 22, 21, 20, 0, 0])


def test_topdown_decode():
    # Hand-build a top-down (negative height) BMP; decoder must not flip.
    r, g, b = _planes(3, 2, seed=9)
    bottom_up = bytearray(bmp.encode_bmp(r, g, b))
    # Patch height to -2 and swap the two stored rows to top-down order.
    struct.pack_into("<i", bottom_up, 18 + 4, -2)
    stride = bmp.row_stride(3)
    row0 = bytes(bottom_up[54 : 54 + stride])
    row1 = bytes(bottom_up[54 + stride : 54 + 2 * stride])
    bottom_up[54 : 54 + stride] = row1
    bottom_up[54 + stride : 54 + 2 * stride] = row0
    w2, h2, r2, g2, b2 = bmp.decode_bmp(bytes(bottom_up))
    assert (w2, h2) == (3, 2)
    np.testing.assert_array_equal(r2, r)


def test_decode_skips_header_gap():
    # A BMP whose pixel data starts past 54 (e.g. after gap/profile
    # bytes): decoder must honour the declared offset.
    r, g, b = _planes(2, 2, seed=3)
    data = bytearray(bmp.encode_bmp(r, g, b))
    body = bytes(data[54:])
    gap = b"\xee" * 10
    patched = bytearray(data[:54]) + gap + body
    struct.pack_into("<I", patched, 10, 54 + len(gap))
    w2, h2, r2, _g2, _b2 = bmp.decode_bmp(bytes(patched))
    assert (w2, h2) == (2, 2)
    np.testing.assert_array_equal(r2, r)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"XX" + d[2:], "magic"),
        (lambda d: d[:100], "truncated"),
        (lambda d: d[:28] + struct.pack("<H", 8) + d[30:], "unsupported"),
    ],
)
def test_decode_rejects_bad_input(mutate, msg):
    r, g, b = _planes(8, 8)
    data = mutate(bmp.encode_bmp(r, g, b))
    with pytest.raises(ValueError, match=msg):
        bmp.decode_bmp(data)


def test_decode_real_dispatch():
    from geo_import_spark.operators import multimodal

    r, g, b = _planes(6, 4, seed=1)
    w, h, fmt, frames = multimodal._decode_real(bmp.encode_bmp(r, g, b))
    assert (w, h, fmt, frames) == (6, 4, "bmp", 1)
    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"\x89PNG\r\n\x1a\n....")


@pytest.fixture()
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    return con


def test_media_pixel_stats_parity(spark, sf_dir, duck):
    """Spark real-decode pipeline == DuckDB closed-form oracle."""
    import __spark_entry__ as entry

    got = (
        entry.queries()["media_pixel_stats"](spark, sf_dir)
        .orderBy("doc_id", "span_offset")
        .collect()
    )
    want = duck.execute(
        entry.oracle_sql()["media_pixel_stats"] + " ORDER BY doc_id, span_offset"
    ).fetchall()
    assert len(got) == len(want) and len(got) > 0
    for gr, wr in zip(got, want):
        assert (
            gr["doc_id"],
            gr["span_offset"],
            gr["width"],
            gr["height"],
            gr["n_pixels"],
            gr["sum_r"],
            gr["sum_g"],
            gr["sum_b"],
        ) == tuple(wr)
