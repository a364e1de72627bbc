"""ZSoft PCX codec (operators/pcx.py): lossless truecolor round trips
including RLE runs across high-byte values (>= 0xC0 literals must be
escaped), even-bytes_per_line padding, 8-bit indexed decode through
the trailing VGA palette, exact-or-refuse on unsupported variants,
and probe_media identification."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from finanalyzer_spark.operators.pcx import (
    _rle_encode_row,
    decode_pcx,
    encode_pcx,
)


@pytest.mark.parametrize("shape", [(8, 5, 3), (16, 16, 3), (1, 1, 3),
                                   (7, 9, 3)])
def test_roundtrip_shapes(shape):
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    img[0] = 0xC5  # high-byte literal: must RLE-escape, not pass raw
    dec = decode_pcx(encode_pcx(img))
    assert dec.shape == img.shape and (dec == img).all()


@given(
    img=arrays(
        np.uint8,
        st.tuples(st.integers(1, 9), st.integers(1, 9), st.just(3)),
    )
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(img):
    assert (decode_pcx(encode_pcx(img)) == img).all()


def test_indexed_palette_decode():
    rng = np.random.RandomState(9)
    h, w = 4, 6
    idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    head = bytearray(128)
    struct.pack_into("<BBBBHHHH", head, 0, 0x0A, 5, 1, 8, 0, 0,
                     w - 1, h - 1)
    head[65] = 1
    struct.pack_into("<H", head, 66, w)
    body = b"".join(_rle_encode_row(idx[y].tobytes()) for y in range(h))
    buf = bytes(head) + body + b"\x0c" + pal.tobytes()
    assert (decode_pcx(buf) == pal[idx]).all()
    # missing palette refuses
    with pytest.raises(NotImplementedError, match="VGA palette"):
        decode_pcx(bytes(head) + body)


def test_refusals_and_truncation():
    img = np.zeros((4, 4, 3), np.uint8)
    ok = encode_pcx(img)
    with pytest.raises(ValueError):
        decode_pcx(ok[:130])
    unc = bytearray(ok)
    unc[2] = 0  # encoding=0
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_pcx(bytes(unc))
    ega = bytearray(ok)
    ega[3] = 4  # 4-bit planes
    with pytest.raises(NotImplementedError):
        decode_pcx(bytes(ega))
    with pytest.raises(ValueError, match="not a PCX"):
        decode_pcx(b"\x00" * 128)


def test_probe_media_identifies_pcx():
    from finanalyzer_spark.operators.multimodal import probe_media

    p = probe_media(encode_pcx(np.full((6, 10, 3), 9, dtype=np.uint8)))
    assert (p["kind"], p["container"], p["codec"]) == (
        "image", "pcx", "pcx-rle-8bit-3plane")
    assert (p["width"], p["height"], p["channels"]) == (10, 6, 3)
