"""PNG codec (operators/png.py): genuinely foreign stdlib fixtures
(palette+tRNS and RGBA, single- and multi-IDAT), a CROSS-FORMAT
conformance check against the independent TIFF decoder, hand-assembled
spec vectors (every filter type, Adam7 interlace, sub-byte depths),
encoder-twin round trips, and exact-or-refuse failure behavior."""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import numpy as np
import pytest

from finanalyzer_spark.operators.png import decode_png, encode_png

_SIG = b"\x89PNG\r\n\x1a\n"

_FIXTURES = "/root/.pyenv/versions"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, raw, interlace=0, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _foreign(path):
    p = os.path.join(_FIXTURES, path)
    if not os.path.exists(p):  # pragma: no cover
        pytest.skip("stdlib fixture not present")
    return open(p, "rb").read()


# ---------------------------------------------------------------- foreign


def test_foreign_palette_png_matches_foreign_tiff_pixel_for_pixel():
    """The CPython test suite ships the same 16x16 logo as python.png
    (palette + tRNS, written by an external PNG tool) and python.tiff
    (RGBA, written by an external TIFF tool).  Decoding both through
    two INDEPENDENT in-repo decoders must agree on every pixel — a
    third-party conformance check with no shared code path."""
    from finanalyzer_spark.operators.tiff import decode_tiff

    png = decode_png(
        _foreign("3.13.0/lib/python3.13/test/test_email/data/python.png")
    )
    tif = decode_tiff(
        _foreign("3.11.7/lib/python3.11/test/test_email/data/python.tiff")
    )
    assert png.shape == (16, 16, 4)
    assert np.array_equal(png, tif)
    # same pin as test_tiff.py's foreign-file check
    assert (
        hashlib.sha256(png.tobytes()).hexdigest()[:16]
        == "8f307041b5cb184d"
    )


@pytest.mark.parametrize(
    "rel,shape,pin",
    [
        (
            "3.11.7/lib/python3.11/idlelib/Icons/idle_16.png",
            (16, 16, 4),  # palette + tRNS
            "9335c4de7fd02289",
        ),
        (
            "3.11.7/lib/python3.11/idlelib/Icons/idle_48.png",
            (48, 48, 4),  # RGBA
            None,
        ),
        (
            "3.11.7/lib/python3.11/idlelib/Icons/idle_256.png",
            (256, 256, 4),  # RGBA, multiple IDAT chunks
            "19c86652ca2b00e1",
        ),
    ],
)
def test_foreign_idle_icons_decode(rel, shape, pin):
    img = decode_png(_foreign(rel))
    assert img.shape == shape
    assert img.dtype == np.uint8
    # real logo content: non-trivial alpha edge and colour spread
    assert img[..., 3].min() < 255 or img[..., :3].std() > 0
    if pin is not None:
        assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == pin


def test_foreign_icons_same_logo_alpha_coverage_scales():
    """idle_16/48 are renderings of one logo: the opaque-pixel share
    should be similar across sizes (loose band, catches gross
    misdecodes like swapped channels or offset scanlines)."""
    a16 = decode_png(
        _foreign("3.11.7/lib/python3.11/idlelib/Icons/idle_16.png")
    )
    a48 = decode_png(
        _foreign("3.11.7/lib/python3.11/idlelib/Icons/idle_48.png")
    )
    c16 = (a16[..., 3] > 128).mean()
    c48 = (a48[..., 3] > 128).mean()
    assert abs(c16 - c48) < 0.25


# ----------------------------------------------------- hand-built vectors


def test_every_filter_type_against_hand_computed_pixels():
    # 3x5 grayscale, one scanline per filter type, pixels worked out
    # by hand from spec §9 (Average floor-halving, Paeth tie order)
    raw = bytes(
        [0, 1, 2, 3]  # None    -> 1 2 3
        + [1, 5, 1, 1]  # Sub     -> 5 6 7
        + [2, 10, 10, 10]  # Up   -> 15 16 17
        + [3, 4, 2, 0]  # Average -> 11 15 16
        + [4, 1, 1, 1]  # Paeth   -> 12 16 17
    )
    img = decode_png(_png(3, 5, 8, 0, raw))
    want = np.array(
        [[1, 2, 3], [5, 6, 7], [15, 16, 17], [11, 15, 16], [12, 16, 17]],
        dtype=np.uint8,
    )[..., None]
    assert np.array_equal(img, want)


def test_adam7_interlace_reassembles_hand_laid_passes():
    # 5x5 grayscale with target pixel value y*10 + x; the seven-pass
    # stream below lists each pass's pixels by hand (spec §8.2 grid)
    passes = [
        [[0]],                     # p1: (0,0)
        [[4]],                     # p2: (4,0)
        [[40, 44]],                # p3: (0,4) (4,4)
        [[2], [42]],               # p4: (2,0) (2,4)
        [[20, 22, 24]],            # p5: (0,2) (2,2) (4,2)
        [[1, 3], [21, 23], [41, 43]],   # p6: x=1,3 / y=0,2,4
        [[10, 11, 12, 13, 14], [30, 31, 32, 33, 34]],  # p7: rows 1,3
    ]
    raw = b"".join(
        b"\x00" + bytes(line) for p in passes for line in p
    )
    img = decode_png(_png(5, 5, 8, 0, raw, interlace=1))
    want = (
        np.arange(5)[:, None] * 10 + np.arange(5)[None, :]
    ).astype(np.uint8)[..., None]
    assert np.array_equal(img, want)


def test_sub_byte_depths_unpack_big_endian_within_bytes():
    # 1-bit, 10 wide: bits 1010101010 100101xxxx -> stride 2
    raw = b"\x00" + bytes([0b10101010, 0b10010100]) + b"\x00" + bytes(
        [0b11110000, 0b00110000]
    )
    img = decode_png(_png(10, 2, 1, 0, raw))
    assert img.shape == (2, 10, 1)
    assert img[0, :, 0].tolist() == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]
    assert img[1, :, 0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    # 4-bit palette: indices 0..3 across a 2-entry-per-byte row
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9]))
    raw4 = b"\x00" + bytes([0x01, 0x23])
    img4 = decode_png(_png(4, 1, 4, 3, raw4, extra=plte))
    assert img4.shape == (1, 4, 3)
    assert img4[0].tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9],
    ]


def test_palette_trns_shorter_than_plte_pads_opaque():
    plte = _chunk(b"PLTE", bytes([10, 10, 10, 20, 20, 20]))
    trns = _chunk(b"tRNS", bytes([128]))  # entry 0 only; entry 1 -> 255
    raw = b"\x00" + bytes([0, 1])
    img = decode_png(_png(2, 1, 8, 3, raw, extra=plte + trns))
    assert img.shape == (1, 2, 4)
    assert img[0, 0].tolist() == [10, 10, 10, 128]
    assert img[0, 1].tolist() == [20, 20, 20, 255]


def test_16_bit_samples_are_big_endian():
    raw = b"\x00" + struct.pack(">HHH", 0, 256, 65535)
    img = decode_png(_png(3, 1, 16, 0, raw))
    assert img.dtype == np.uint16
    assert img[0, :, 0].tolist() == [0, 256, 65535]


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_encoder_twin_round_trip_uint8(ch):
    rng = np.random.default_rng(ch)
    # ramps + flats + noise so the adaptive filter picks different
    # types per row, exercising Sub/Up/Average/Paeth in decode
    img = np.zeros((11, 23, ch), dtype=np.uint8)
    img[..., 0] = (np.arange(23)[None, :] * 7 + np.arange(11)[:, None]) % 256
    img[3:6] = 100
    img[8] = rng.integers(0, 256, (23, ch), dtype=np.uint8)
    enc = encode_png(img)
    assert np.array_equal(decode_png(enc), img)
    assert encode_png(img) == enc  # deterministic


def test_encoder_twin_round_trip_uint16():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 65536, (6, 9, 3), dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(img)), img)


def _idat(buf: bytes) -> bytes:
    pos, out = 8, bytearray()
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        if typ == b"IDAT":
            out += buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return bytes(out)


def test_adaptive_filter_actually_varies():
    img = np.zeros((8, 64, 1), dtype=np.uint8)
    img[0, :, 0] = np.arange(64) % 256          # -> Sub wins
    img[1] = img[0]                              # -> Up wins
    img[4:] = 7                                  # flats
    raw = zlib.decompress(_idat(encode_png(img)))
    fts = {raw[y * 65] for y in range(8)}
    assert len(fts) >= 2


# ------------------------------------------------------------ fail closed


def test_refuses_garbage_and_truncation():
    good = encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(b"notapng" + good)
    with pytest.raises(ValueError):
        decode_png(good[:-8])  # IEND gone
    # flip a byte inside IDAT -> CRC mismatch
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_refuses_unknown_filter_and_illegal_matrix():
    raw = bytes([9, 1, 2, 3])  # filter type 9
    with pytest.raises(ValueError):
        decode_png(_png(3, 1, 8, 0, raw))
    with pytest.raises(ValueError):  # depth 4 illegal for RGB
        decode_png(_png(1, 1, 4, 2, b"\x00\x00"))
    with pytest.raises(ValueError):  # palette image without PLTE
        decode_png(_png(1, 1, 8, 3, b"\x00\x00"))


def test_refuses_colour_key_trns_rather_than_guessing():
    trns = _chunk(b"tRNS", struct.pack(">H", 0))
    raw = b"\x00\x05"
    with pytest.raises(NotImplementedError):
        decode_png(_png(1, 1, 8, 0, raw, extra=trns))
