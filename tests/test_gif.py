"""Pure-python GIF codec tests: LZW round-trips with real dictionary
growth, interlacing, transparency/disposal compositing, and the Spark
image-kernel path."""

from __future__ import annotations

import struct
import zlib  # noqa: F401 — parity with other codec tests' imports

import numpy as np
import pytest

from finanalyzer_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_roundtrip_exercises_dictionary_growth():
    rng = np.random.default_rng(41)
    # long repetitive stream -> dictionary entries + width growth
    idx = bytes(rng.integers(0, 4, size=20_000, dtype=np.uint8))
    enc = _lzw_encode(2, idx)

    def unblocked(b: bytes) -> bytes:
        out, pos = bytearray(), 0
        while True:
            n = b[pos]
            pos += 1
            if n == 0:
                return bytes(out)
            out += b[pos : pos + n]
            pos += n

    got = _lzw_decode(2, unblocked(enc), len(idx))
    assert got == idx
    # compression actually happened (dictionary was used)
    assert len(enc) < len(idx)


def test_lzw_kwkwk_case():
    # 'aba' over alphabet {a,b} then 'abab...' triggers code==next_code
    idx = b"\x00\x01\x00\x00\x01\x00\x00\x01\x00"
    enc = _lzw_encode(2, idx)
    out, pos = bytearray(), 0
    while True:
        n = enc[pos]
        pos += 1
        if n == 0:
            break
        out += enc[pos : pos + n]
        pos += n
    assert _lzw_decode(2, bytes(out), len(idx)) == idx


def test_gif_single_frame_roundtrip_exact():
    rng = np.random.default_rng(43)
    # <=256 distinct colors by construction (16 color choices)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    px = palette[rng.integers(0, 16, size=(13, 9))]
    got = list(decode_gif(encode_gif([px])))
    assert len(got) == 1
    assert np.array_equal(got[0][1], px)


def test_gif_animation_frames_roundtrip():
    rng = np.random.default_rng(47)
    palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    frames = [palette[rng.integers(0, 8, size=(6, 6))] for _ in range(4)]
    got = list(decode_gif(encode_gif(frames)))
    assert [no for no, _ in got] == [0, 1, 2, 3]
    for (_, g), f in zip(got, frames):
        assert np.array_equal(g, f)  # full-size frames: exact


def test_gif_interlaced_frame_decodes():
    """Hand-build an interlaced image: rows permuted into pass order
    must come back in display order."""
    h, w = 8, 4
    rows = np.arange(h, dtype=np.uint8).repeat(w).reshape(h, w)  # row idx
    # pass order for 8 rows: 0, 4, 2, 6, 1, 3, 5, 7
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    permuted = rows[pass_order]
    idx_stream = bytes(permuted.ravel())
    lzw = _lzw_encode(3, idx_stream)
    gct = bytes(range(8)) * 3  # 8 grey-ish colors (r=g=b=i not needed)
    palette = np.array([[i, i, i] for i in range(8)], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 2, 0, 0)  # GCT of 8
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    out += bytes([3]) + lzw
    out += b"\x3b"
    frames = list(decode_gif(bytes(out)))
    assert len(frames) == 1
    got = frames[0][1]
    for r in range(h):
        assert (got[r] == r).all(), r


def test_gif_transparency_composites_over_previous_frame():
    """Frame 2 paints one pixel, everything else transparent: the
    composite must equal frame 1 except that pixel."""
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:, :] = [10, 20, 30]
    palette = np.array(
        [[10, 20, 30], [200, 0, 0], [0, 0, 0]], dtype=np.uint8
    )
    lut = {tuple(c): i for i, c in enumerate(palette)}
    idx1 = bytes(lut[(10, 20, 30)] for _ in range(16))
    idx2 = bytearray([2] * 16)  # index 2 = transparent
    idx2[5] = 1  # one red pixel
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # GCT of 4
    pal4 = np.zeros((4, 3), dtype=np.uint8)
    pal4[:3] = palette
    out += pal4.tobytes()
    for idx, transparent in ((idx1, None), (bytes(idx2), 2)):
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
        out += bytes([2]) + _lzw_encode(2, idx)
    out += b"\x3b"
    frames = [f for _, f in decode_gif(bytes(out))]
    assert len(frames) == 2
    assert np.array_equal(frames[0], base)
    want = base.copy()
    want[1, 1] = [200, 0, 0]  # pixel 5 = (row 1, col 1)
    assert np.array_equal(frames[1], want)


def test_gif_rejected_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        list(decode_gif(b"definitely not a gif"))


def test_gif_through_spark_image_kernel(spark):
    """GIF rides the image feature kernel (first frame) — identical
    features to its exact PPM twin."""
    from finanalyzer_spark.operators.multimodal import decode_image_features

    rng = np.random.default_rng(53)
    palette = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    px = palette[rng.integers(0, 32, size=(8, 8))]
    gif = encode_gif([px])
    ppm = b"P6\n8 8\n255\n" + px.tobytes()
    media = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(ppm))],
        "media_id long, content binary",
    )
    feats = {
        r["media_id"]: list(r["feature"])
        for r in decode_image_features(media, fake=False).collect()
    }
    assert feats[1] == feats[2]
