"""QOI codec (operators/qoi.py): encoder-twin round trips, a
hand-assembled FOREIGN byte vector with hand-computed pixels (the
format has no normative tables, so the vector covers every op code),
and exact-or-refuse failure behavior."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.qoi import decode_qoi, encode_qoi

_END = b"\x00" * 7 + b"\x01"


def _header(w, h, ch, cs=0):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


def test_foreign_vector_every_op_decodes_to_hand_computed_pixels():
    # RGB 2x2: OP_RGB, OP_DIFF(+1,0,-2), OP_LUMA(dg=+5,dr-dg=-3,
    # db-dg=+2), OP_INDEX back to pixel 0 (hash(10,20,30,255) == 9)
    buf = (
        _header(2, 2, 3)
        + bytes([0xFE, 10, 20, 30])
        + bytes([0x40 | (3 << 4) | (2 << 2) | 0])
        + bytes([0x80 | (5 + 32), ((-3 + 8) << 4) | (2 + 8)])
        + bytes([9])
        + _END
    )
    got = decode_qoi(buf)
    want = np.array(
        [[[10, 20, 30], [11, 20, 28]], [[13, 25, 35], [10, 20, 30]]],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)

    # RGBA 3x1: OP_RGBA then OP_RUN of 2
    buf2 = (
        _header(3, 1, 4)
        + bytes([0xFF, 1, 2, 3, 4])
        + bytes([0xC0 | 1])
        + _END
    )
    got2 = decode_qoi(buf2)
    assert np.array_equal(
        got2, np.array([[[1, 2, 3, 4]] * 3], dtype=np.uint8)
    )


@pytest.mark.parametrize("ch", [3, 4])
def test_round_trip_exercises_all_ops(ch):
    rng = np.random.default_rng(7)
    h, w = 13, 17
    img = np.zeros((h, w, ch), dtype=np.uint8)
    # smooth ramps (DIFF/LUMA), long flats (RUN), repeats (INDEX),
    # random jumps (RGB/RGBA)
    img[..., 0] = (np.arange(w)[None, :] + np.arange(h)[:, None]) % 256
    img[..., 1] = np.arange(w)[None, :] * 3 % 256
    img[..., 2] = 77
    if ch == 4:
        img[..., 3] = 255
        img[5:, :, 3] = 128  # alpha change forces OP_RGBA
    img[3, :] = img[2, :]          # repeated rows
    jump = rng.integers(0, 256, (4, ch), dtype=np.uint8)
    img[7, 2:6] = jump
    img[9, 1:5] = jump             # cache hits
    enc = encode_qoi(img)
    assert np.array_equal(decode_qoi(enc), img)
    # determinism
    assert encode_qoi(img) == enc


def test_run_lengths_at_62_boundary_and_full_flat_image():
    img = np.full((4, 62, 3), 200, dtype=np.uint8)
    enc = encode_qoi(img)
    assert np.array_equal(decode_qoi(enc), img)
    img2 = np.full((1, 63, 3), 0, dtype=np.uint8)  # run crosses 62
    assert np.array_equal(decode_qoi(encode_qoi(img2)), img2)


def test_exact_or_refuse_on_malformed_streams():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    enc = encode_qoi(img)
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"nope" + enc[4:])
    with pytest.raises(ValueError, match="truncated|end marker"):
        decode_qoi(enc[:-9])
    # a run overrunning the declared pixel count must refuse
    bad = _header(1, 1, 3) + bytes([0xC0 | 5]) + _END
    with pytest.raises(ValueError, match="overruns"):
        decode_qoi(bad)
    with pytest.raises(ValueError):
        encode_qoi(np.zeros((4, 4), dtype=np.uint8))  # not 3-channel


def test_probe_media_identifies_qoi():
    from finanalyzer_spark.operators.multimodal import probe_media

    img = np.zeros((5, 9, 4), dtype=np.uint8)
    got = probe_media(encode_qoi(img))
    assert (got["kind"], got["container"], got["width"],
            got["height"], got["channels"]) == ("image", "qoi", 9, 5, 4)
