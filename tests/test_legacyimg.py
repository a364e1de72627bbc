"""Legacy raster formats (operators/legacyimg.py): the CPython
`imghdrdata/python.*` fixtures carry the same 16x16 logo written by
external tools in every format, so Sun Raster, SGI, PPM, PGM, PBM and
XBM decodes are cross-checked against the already-foreign-certified
PNG decode — four formats land bit-identical RGBA (one shared sha pin
with tests/test_png.py / test_tiff.py), the rest land at their
format's fidelity.  Plus encoder-twin round trips (RLE and verbatim)
and exact-or-refuse failure behavior."""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.legacyimg import (
    decode_pnm,
    decode_ras,
    decode_sgi,
    decode_xbm,
    encode_pnm,
    encode_ras,
    encode_sgi,
)

_IMG = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata"
_PNG = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/"
    "python.png"
)
#: sha256[:16] of the logo's RGBA pixels — the SAME pin as the
#: foreign PNG/TIFF cross-check in tests/test_png.py
_LOGO_RGBA_PIN = "8f307041b5cb184d"


def _foreign(name: str) -> bytes:
    p = os.path.join(_IMG, name)
    if not os.path.exists(p):  # pragma: no cover
        pytest.skip("stdlib image fixture not present")
    return open(p, "rb").read()


def _png_logo():
    if not os.path.exists(_PNG):  # pragma: no cover
        pytest.skip("stdlib png fixture not present")
    from finanalyzer_spark.operators.png import decode_png

    return decode_png(open(_PNG, "rb").read())


# ---------------------------------------------------------------- foreign

def test_foreign_sun_raster_bit_identical_to_png():
    """python.ras (RT_FORMAT_RGB, depth 32) decodes to the exact RGBA
    of the foreign PNG — two unrelated formats, two independent
    decoders, one pixel array."""
    ras = decode_ras(_foreign("python.ras"))
    assert ras.shape == (16, 16, 4)
    assert hashlib.sha256(ras.tobytes()).hexdigest()[:16] == _LOGO_RGBA_PIN
    assert np.array_equal(ras, _png_logo())


def test_foreign_sgi_rle_bit_identical_to_png():
    """python.sgi (RLE storage, 4 channels, bottom-up planar rows)
    decodes to the same RGBA pin."""
    sgi = decode_sgi(_foreign("python.sgi"))
    assert sgi.shape == (16, 16, 4)
    assert hashlib.sha256(sgi.tobytes()).hexdigest()[:16] == _LOGO_RGBA_PIN
    assert np.array_equal(sgi, _png_logo())


def test_foreign_ppm_matches_png_rgb():
    ppm = decode_pnm(_foreign("python.ppm"))
    assert ppm.shape == (16, 16, 3)
    assert np.array_equal(ppm, _png_logo()[:, :, :3])


def test_foreign_pgm_is_rec601_luma_of_the_logo():
    pgm = decode_pnm(_foreign("python.pgm"))
    rgb = _png_logo().astype(np.int64)
    luma = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    assert np.abs(pgm[:, :, 0].astype(np.int64) - luma).max() <= 4


def test_foreign_pbm_equals_foreign_xbm():
    """The 1-bit fixtures agree pixel-for-pixel across two different
    text/bit encodings and two independent parsers."""
    pbm = decode_pnm(_foreign("python.pbm"))
    xbm = decode_xbm(_foreign("python.xbm"))
    assert pbm.shape == xbm.shape == (16, 16, 3)
    assert np.array_equal(pbm, xbm)
    assert set(np.unique(pbm)) <= {0, 255}


# ------------------------------------------------------------ round trips

def _rand_img(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    # plant runs so RLE paths exercise both literal and repeat ops
    img[:, : w // 2] = img[:, :1]
    return img


@pytest.mark.parametrize("ch", [3, 4])
@pytest.mark.parametrize("rle", [False, True])
def test_ras_roundtrip(ch, rle):
    img = _rand_img(7, 13, ch, 42 + ch)
    out = decode_ras(encode_ras(img, rle=rle))
    assert out.shape == img.shape and np.array_equal(out, img)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("rle", [False, True])
def test_sgi_roundtrip(ch, rle):
    img = _rand_img(9, 17, ch, 7 + ch)
    out = decode_sgi(encode_sgi(img, rle=rle))
    assert out.shape == (9, 17, ch)
    assert np.array_equal(out, img)


def test_sgi_rle_worst_case_rows():
    """All-literal and all-run rows both survive the RLE twin."""
    lit = np.arange(256, dtype=np.uint8).reshape(2, 128, 1)
    run = np.full((2, 128, 1), 200, dtype=np.uint8)
    for img in (lit, run):
        assert np.array_equal(decode_sgi(encode_sgi(img)), img)


def test_pnm_roundtrip_and_ascii_variants():
    img = _rand_img(5, 11, 3, 3)
    assert np.array_equal(decode_pnm(encode_pnm(img, 6)), img)
    gray = img[:, :, 0]
    out = decode_pnm(encode_pnm(gray, 5))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # ASCII P2 with comments and odd whitespace
    p2 = b"P2 # c\n3 2 # wh\n 255\n0 128 255\n1 2 3\n"
    out = decode_pnm(p2)
    assert out[:, :, 0].tolist() == [[0, 128, 255], [1, 2, 3]]
    # P1 ASCII bitmap: 1 = ink = 0
    p1 = b"P1\n2 2\n1 0 0 1\n"
    assert decode_pnm(p1)[:, :, 0].tolist() == [[0, 255], [255, 0]]
    # maxval scaling (P3, maxval 7)
    p3 = b"P3\n1 1\n7\n7 0 3\n"
    assert decode_pnm(p3)[0, 0].tolist() == [255, 0, 109]


def test_xbm_parses_mixed_case_and_wrapping():
    src = (
        b"#define tiny_width 10\n#define tiny_height 2\n"
        b"static unsigned char tiny_bits[] = {\n"
        b"  0xFF, 0x03, 0x01, 0x00 };\n"
    )
    px = decode_xbm(src)[:, :, 0]
    assert px.shape == (2, 10)
    assert px[0].tolist() == [0] * 10          # 0xFF + low bits of 0x03
    assert px[1].tolist() == [0] + [255] * 9   # 0x01


# ------------------------------------------------------- exact-or-refuse

def test_refusals_and_errors():
    with pytest.raises(ValueError, match="not a Sun Raster"):
        decode_ras(b"\x00" * 40)
    with pytest.raises(NotImplementedError, match="depth 16"):
        decode_ras(struct.pack(">8i", 0x59A66A95, 2, 2, 16, 8, 1, 0, 0))
    with pytest.raises(ValueError, match="truncated"):
        decode_ras(struct.pack(">8i", 0x59A66A95, 4, 4, 24, 64, 1, 0, 0))
    with pytest.raises(ValueError, match="not an SGI"):
        decode_sgi(b"\x00" * 600)
    with pytest.raises(NotImplementedError, match="2-byte"):
        bad = struct.pack(">hBBHHHH", 474, 0, 2, 3, 2, 2, 3)
        decode_sgi(bad + b"\x00" * 600)
    with pytest.raises(ValueError, match="not a PNM"):
        decode_pnm(b"P7\n1 1\n255\nx")
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="not an XBM"):
        decode_xbm(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):
        encode_pnm(np.zeros((2, 2, 3), np.uint8), kind=3)
