"""Baseline TIFF codec (operators/tiff.py): hand-assembled foreign
vectors (raw IFD layout in both byte orders, the PackBits worked
example from the spec's companion note, a hand-derived 9-bit LZW code
stream), encoder-twin round trips across compressions and strip
layouts, and exact-or-refuse boundaries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.tiff import (
    _lzw_decode,
    _unpackbits,
    decode_tiff,
    encode_tiff,
)


def _ifd_le(entries, data: bytes) -> bytes:
    """Hand-build a little-endian TIFF: header + one IFD + data."""
    ifd_off = 8
    body = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        body += struct.pack("<HHI", tag, typ, cnt) + val
    body += struct.pack("<I", 0)
    out = b"II" + struct.pack("<HI", 42, ifd_off) + body + data
    return out


def test_foreign_vector_uncompressed_little_endian():
    # 2x2 gray, strip data right after the IFD
    data_off = 8 + 2 + 4 * 12 + 4
    buf = _ifd_le(
        [
            (256, 4, 1, struct.pack("<I", 2)),   # width
            (257, 4, 1, struct.pack("<I", 2)),   # height
            (273, 4, 1, struct.pack("<I", data_off)),  # strip offset
            (279, 4, 1, struct.pack("<I", 4)),   # strip byte count
        ],
        bytes([10, 20, 30, 40]),
    )
    got = decode_tiff(buf)
    assert np.array_equal(
        got, np.array([[10, 20], [30, 40]], dtype=np.uint8)
    )


def test_foreign_vector_big_endian():
    # 1x2 gray, MM byte order, hand-assembled
    data_off = 8 + 2 + 4 * 12 + 4
    body = struct.pack(">H", 4)
    for tag, typ, cnt, val in [
        (256, 4, 1, struct.pack(">I", 2)),
        (257, 4, 1, struct.pack(">I", 1)),
        (273, 4, 1, struct.pack(">I", data_off)),
        (279, 4, 1, struct.pack(">I", 2)),
    ]:
        body += struct.pack(">HHI", tag, typ, cnt) + val
    body += struct.pack(">I", 0)
    buf = b"MM" + struct.pack(">HI", 42, 8) + body + bytes([7, 250])
    assert np.array_equal(
        decode_tiff(buf), np.array([[7, 250]], dtype=np.uint8)
    )


def test_packbits_spec_worked_example():
    """The PackBits reference example (Apple TN1023, reproduced in the
    TIFF 6.0 spec's PackBits section)."""
    packed = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    want = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22"
        + "AA" * 10
    )
    assert _unpackbits(packed, len(want)) == want


def test_lzw_hand_derived_code_stream():
    # 9-bit MSB-first codes: Clear(256) 'A'(65) 'B'(66) 258 EOI(257)
    # -> "ABAB" (code 258 is the just-created 'AB' entry)
    codes = [256, 65, 66, 258, 257]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _lzw_decode(bytes(out), 4) == b"ABAB"


@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize(
    "shape", [(20, 33), (20, 33, 3), (20, 33, 4), (3, 300, 3)]
)
def test_round_trip(comp, shape):
    rng = np.random.default_rng(hash((comp,) + shape) % 2**31)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(img, compression=comp)), img)


def test_lzw_predictor_round_trip_and_gain():
    ramp = (np.arange(64)[None, :] * 4 % 256).astype(np.uint8)
    img = np.repeat(ramp, 32, axis=0)
    plain = encode_tiff(img, compression=5)
    pred = encode_tiff(img, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(pred), img)
    assert len(pred) < len(plain)  # differencing must pay on ramps


def test_exact_or_refuse():
    img = np.zeros((4, 4), dtype=np.uint8)
    buf = encode_tiff(img)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04" + buf)
    with pytest.raises(ValueError, match="truncated TIFF strip"):
        decode_tiff(buf[:-3])
    # 16-bit samples refuse
    data_off = 8 + 2 + 5 * 12 + 4
    buf16 = _ifd_le(
        [
            (256, 4, 1, struct.pack("<I", 1)),
            (257, 4, 1, struct.pack("<I", 1)),
            (258, 3, 1, struct.pack("<I", 16)),
            (273, 4, 1, struct.pack("<I", data_off)),
            (279, 4, 1, struct.pack("<I", 2)),
        ],
        b"\x00\x01",
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_tiff(buf16)
    # unknown compression refuses
    bufc = _ifd_le(
        [
            (256, 4, 1, struct.pack("<I", 1)),
            (257, 4, 1, struct.pack("<I", 1)),
            (259, 3, 1, struct.pack("<I", 7)),  # JPEG-in-TIFF
            (273, 4, 1, struct.pack("<I", data_off)),
            (279, 4, 1, struct.pack("<I", 1)),
        ],
        b"\x00",
    )
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bufc)


def test_probe_media_reads_tiff_dimensions():
    from finanalyzer_spark.operators.multimodal import probe_media

    img = np.zeros((6, 11, 3), dtype=np.uint8)
    got = probe_media(encode_tiff(img, compression=5))
    assert got["kind"] == "image"
    assert got["container"] == "tiff"
    assert (got["width"], got["height"]) in ((11, 6), (None, None))


def test_lzw_round_trips_across_every_width_boundary_length():
    """Regression for the EarlyChange tail desync found by the sf0.1
    oracle: the code following the final data insertion sits exactly
    on the width-bump boundary, so byte-count-driven decode (libtiff
    semantics) must round-trip every strip length around the 511
    entry boundary, not just the sizes unit tests happen to pick."""
    rng = np.random.default_rng(42)
    for n in list(range(240, 280)) + [509, 510, 511, 512, 513, 1021,
                                      1022, 1023, 1024, 1025]:
        from finanalyzer_spark.operators.tiff import (
            _lzw_decode,
            _lzw_encode,
        )

        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), n) == data, n


def test_foreign_file_from_python_stdlib_decodes():
    """A genuinely third-party TIFF (CPython's test-suite fixture,
    written by an external tool): 16x16 RGBA uncompressed — decode
    must parse the real-world IFD (extra tags, RowsPerStrip 128)
    and produce the right shape and a stable checksum."""
    import os

    path = (
        "/root/.pyenv/versions/3.11.7/lib/python3.11/test/"
        "test_email/data/python.tiff"
    )
    if not os.path.exists(path):  # pragma: no cover
        pytest.skip("stdlib fixture not present")
    img = decode_tiff(open(path, "rb").read())
    assert img.shape == (16, 16, 4)
    assert int(img.astype(np.int64).sum()) > 0
    # pinned: content must not drift with parser changes
    import hashlib

    assert (
        hashlib.sha256(img.tobytes()).hexdigest()[:16]
        == "8f307041b5cb184d"
    )
