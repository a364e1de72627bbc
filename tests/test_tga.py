"""Truevision TGA codec (operators/tga.py): lossless round trips over
all supported shapes (24/32-bit truecolor, 8-bit gray, RLE and
uncompressed, both row origins), hypothesis-generated images, the
exact-or-refuse contract on unsupported variants, and probe_media
identification via the v2 footer signature."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from finanalyzer_spark.operators.tga import decode_tga, encode_tga


@pytest.mark.parametrize("rle", [True, False])
@pytest.mark.parametrize("shape", [(8, 5, 3), (16, 16, 4), (7, 9)])
def test_roundtrip_shapes(rle, shape):
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    if len(shape) == 3:
        img[0] = 42  # long run exercising the RLE packet path
    dec = decode_tga(encode_tga(img, rle=rle))
    want = img if img.ndim == 3 else img[..., None]
    assert dec.shape == want.shape
    assert (dec == want).all()


@given(
    img=arrays(
        np.uint8,
        st.tuples(st.integers(1, 9), st.integers(1, 9), st.just(3)),
    ),
    rle=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(img, rle):
    dec = decode_tga(encode_tga(img, rle=rle))
    assert (dec == img).all()


def test_bottom_up_storage_decodes():
    """A hand-built bottom-up (default-origin) type-2 TGA: rows must
    flip — pins the origin handling against the spec, independent of
    the top-origin encoder twin."""
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    bgr = img[..., ::-1]
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 24, 0
    )
    buf = head + bgr[::-1].tobytes()  # stored bottom row first
    assert (decode_tga(buf) == img).all()


def test_refusals():
    cmapped = struct.pack(
        "<BBBHHBHHHHBB", 0, 1, 1, 0, 4, 24, 0, 0, 2, 2, 8, 0
    ) + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="color-mapped"):
        decode_tga(cmapped)
    bit16 = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 16, 0
    ) + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_tga(bit16)
    ok = encode_tga(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_tga(ok[:20])


def test_probe_media_identifies_tga():
    from finanalyzer_spark.operators.multimodal import probe_media

    img = np.full((6, 10, 3), 9, dtype=np.uint8)
    p = probe_media(encode_tga(img, rle=True))
    assert (p["kind"], p["container"], p["codec"]) == (
        "image", "tga", "tga-rle")
    assert (p["width"], p["height"], p["channels"]) == (10, 6, 3)
    p = probe_media(encode_tga(img[..., 0], rle=False))
    assert p["codec"] == "tga-gray" and p["channels"] == 1
