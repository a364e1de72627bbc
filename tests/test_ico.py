"""Windows ICO container codec (operators/ico.py): round trips over
the supported variant matrix, the AND-mask transparency rule, the
PNG-entry delegate, and the exact-or-refuse contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.ico import decode_ico, encode_ico, probe_ico
from finanalyzer_spark.operators.png import encode_png

RNG = np.random.RandomState(20260816)


@pytest.mark.parametrize(
    "h,w", [(1, 1), (8, 5), (8, 64), (3, 33), (256, 256), (7, 31)]
)
def test_rgb_round_trip(h, w):
    img = RNG.randint(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_ico(encode_ico(img))
    assert dec.shape == (h, w, 4)
    assert np.array_equal(dec[:, :, :3], img)
    assert (dec[:, :, 3] == 255).all()


def test_rgba_round_trip_preserves_alpha():
    img = RNG.randint(0, 256, (9, 17, 4), dtype=np.uint8)
    assert np.array_equal(decode_ico(encode_ico(img)), img)


def test_and_mask_zeroes_alpha():
    """A set AND-mask bit makes the pixel transparent regardless of the
    stored alpha byte (the classic-icon transparency rule)."""
    img = np.full((2, 2, 4), 200, np.uint8)
    buf = bytearray(encode_ico(img))
    # AND mask starts after: 6 dir + 16 entry + 40 header + 2*2*4 XOR
    and_off = 6 + 16 + 40 + 16
    buf[and_off] = 0b10000000  # bottom-left pixel (bottom-up rows)
    dec = decode_ico(bytes(buf))
    assert dec[1, 0, 3] == 0 and dec[1, 1, 3] == 200
    assert dec[0, 0, 3] == 200 and (dec[1, 0, :3] == 200).all()


def test_png_entry_delegates():
    img = RNG.randint(0, 256, (6, 9, 3), dtype=np.uint8)
    png = encode_png(img)
    entry = struct.pack("<BBBBHHII", 9, 6, 0, 0, 1, 32, len(png), 22)
    buf = struct.pack("<HHH", 0, 1, 1) + entry + png
    dec = decode_ico(buf)
    assert dec.shape == (6, 9, 4)
    assert np.array_equal(dec[:, :, :3], img)
    assert probe_ico(buf)["entries"][0]["kind"] == "png"


def test_probe_reports_dimensions_without_decoding():
    img = RNG.randint(0, 256, (8, 12, 3), dtype=np.uint8)
    p = probe_ico(encode_ico(img))
    assert p == {
        "container": "ico",
        "n_images": 1,
        "entries": [{"width": 12, "height": 8, "kind": "dib"}],
    }


def test_256_encodes_as_zero_in_directory():
    img = RNG.randint(0, 256, (256, 256, 3), dtype=np.uint8)
    buf = encode_ico(img)
    assert buf[6] == 0 and buf[7] == 0  # width/height bytes
    assert decode_ico(buf).shape == (256, 256, 4)


@pytest.mark.parametrize(
    "mutate,exc,frag",
    [
        (lambda b: b[:4], ValueError, "header truncated"),
        (lambda b: b[:-3], ValueError, "truncated"),
        (
            lambda b: struct.pack("<HHH", 0, 2, 1) + b[6:],
            NotImplementedError,
            "CUR",
        ),
        (
            lambda b: struct.pack("<HHH", 1, 1, 1) + b[6:],
            ValueError,
            "not an ICO",
        ),
        (lambda b: struct.pack("<HHH", 0, 1, 0) + b[6:], ValueError, "empty"),
    ],
)
def test_refusals(mutate, exc, frag):
    buf = encode_ico(RNG.randint(0, 256, (4, 4, 3), dtype=np.uint8))
    with pytest.raises(exc, match=frag):
        decode_ico(mutate(buf))


def test_unsupported_bpp_refuses():
    buf = bytearray(encode_ico(RNG.randint(0, 256, (4, 4, 3), np.uint8)))
    struct.pack_into("<H", buf, 6 + 16 + 14, 24)  # DIB bit count
    with pytest.raises(NotImplementedError, match="bpp=24"):
        decode_ico(bytes(buf))


def test_entry_index_bounds():
    buf = encode_ico(RNG.randint(0, 256, (4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        decode_ico(buf, index=1)
