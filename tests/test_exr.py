"""OpenEXR codec (operators/exr.py): the genuinely foreign stdlib
python.exr (uncompressed ABGR half, written by an external tool) must
agree with the foreign-certified PNG decode EXACTLY after 8-bit
quantization — a sixth independent format converging on the shared
logo pixels — plus encoder-twin round trips across NONE/ZIPS/ZIP and
exact-or-refuse failure behavior."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.exr import decode_exr, encode_exr

_EXR = (
    "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/"
    "python.exr"
)
_PNG = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/"
    "python.png"
)


def test_foreign_exr_matches_foreign_png_after_quantization():
    """The logo's EXR stores the sRGB bytes as half floats; rounding
    decode*255 must reproduce the PNG's RGBA bit-for-bit (the same
    pixel truth as the PNG/TIFF/RAS/SGI/BMP pin)."""
    if not (os.path.exists(_EXR) and os.path.exists(_PNG)):
        pytest.skip("stdlib fixtures not present")  # pragma: no cover
    from finanalyzer_spark.operators.png import decode_png

    px, names = decode_exr(open(_EXR, "rb").read())
    assert px.shape == (16, 16, 4) and names == ["A", "B", "G", "R"]
    rgba = np.stack(
        [px[:, :, names.index(c)] for c in "RGBA"], axis=2
    )
    png = decode_png(open(_PNG, "rb").read())
    assert np.array_equal(
        np.round(rgba * 255).astype(np.uint8), png
    )


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
@pytest.mark.parametrize("shape", [(17, 9, 3), (33, 5, 4), (1, 1, 1)])
def test_roundtrip_half_exact(comp, shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.rand(*shape).astype(np.float32)
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}[
        shape[2]
    ]
    dec, nm = decode_exr(encode_exr(img, names, comp))
    back = np.stack([dec[:, :, nm.index(c)] for c in names], axis=2)
    assert np.array_equal(
        back, img.astype(np.float16).astype(np.float32)
    )


def test_zip_raw_stored_blocks_and_flat_content():
    """Incompressible blocks are stored raw (spec), compressible ones
    exercise the delta+interleave reconstruction filter."""
    flat = np.tile(
        np.array([[0.5, 0.25, 1.0]], dtype=np.float32), (20, 8, 1)
    )
    buf = encode_exr(flat, ["R", "G", "B"], "zip")
    dec, nm = decode_exr(buf)
    back = np.stack([dec[:, :, nm.index(c)] for c in "RGB"], axis=2)
    assert np.array_equal(back, flat)


def test_half_exactness_of_small_dyadic_values():
    """k/256 for k in 0..255 is exactly representable in half — the
    property the media_exr_pixel_stats oracle relies on."""
    v = np.arange(256, dtype=np.float32) / 256.0
    assert np.array_equal(v.astype(np.float16).astype(np.float32), v)


def test_refusals_and_errors():
    with pytest.raises(ValueError, match="not an OpenEXR"):
        decode_exr(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    # tiled flag set
    buf = encode_exr(np.zeros((2, 2, 1), np.float32), ["Y"], "none")
    tiled = buf[:4] + struct.pack("<I", 2 | 0x200) + buf[8:]
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_exr(tiled)
    # unsupported compression id (4 = PIZ)
    bad = buf.replace(
        b"compression\x00compression\x00\x01\x00\x00\x00\x00",
        b"compression\x00compression\x00\x01\x00\x00\x00\x04",
    )
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_exr(bad)
    with pytest.raises(ValueError, match="channel-name count"):
        encode_exr(np.zeros((2, 2, 3), np.float32), ["R", "G"])
