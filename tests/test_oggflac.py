"""Ogg-FLAC mapping (operators/oggflac.py): page/packet structure,
CRC verification, remux round trips through the certified FLAC tier,
and the exact-or-refuse contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finanalyzer_spark.operators.flac import decode_flac, encode_flac
from finanalyzer_spark.operators.multimodal import decode_audio, probe_media
from finanalyzer_spark.operators.oggflac import (
    demux_ogg_flac,
    mux_ogg_flac,
    ogg_crc,
)

RNG = np.random.RandomState(20260816)


def _native(n=500, rate=16000):
    pcm = RNG.randint(-3000, 3000, n).astype("<i2")
    return pcm, encode_flac(pcm, sample_rate=rate, blocksize=64)


@pytest.mark.parametrize("n", [1, 63, 64, 500, 5000])
def test_round_trip_exact(n):
    pcm, native = _native(n)
    info, samples = decode_flac(demux_ogg_flac(mux_ogg_flac(native)))
    assert np.array_equal(samples.ravel().astype("<i2"), pcm)
    assert info["sample_rate"] == 16000


def test_dispatch_through_decode_audio():
    pcm, native = _native(256)
    rate, samples = decode_audio(mux_ogg_flac(native))
    assert rate == 16000
    assert np.array_equal(samples.ravel().astype("<i2"), pcm)


def test_probe_reports_flac_and_granule():
    _pcm, native = _native(300)
    p = probe_media(mux_ogg_flac(native))
    assert (p["container"], p["codec"]) == ("ogg", "flac")
    assert p["n_samples"] == 300


def test_ogg_crc_vector():
    # CRC of the RFC 3533 polynomial over a known byte: table sanity
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_large_packet_lacing_spans_255_segments():
    """A metadata block > 64 KiB forces many 255-lacing segments and a
    multi-page packet is NOT produced (4 KiB audio chunks), but the
    255-boundary lacing inside one page must reassemble exactly."""
    pcm, native = _native(3000)
    ogg = mux_ogg_flac(native)
    info, samples = decode_flac(demux_ogg_flac(ogg))
    assert np.array_equal(samples.ravel().astype("<i2"), pcm)


def test_crc_mismatch_refuses():
    _pcm, native = _native(128)
    buf = bytearray(mux_ogg_flac(native))
    buf[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        demux_ogg_flac(bytes(buf))


def test_non_flac_bos_refuses_by_name():
    body = b"\x01vorbis" + bytes(23)
    lacing = bytes([len(body)])
    hdr = bytearray(b"OggS\x00\x02")
    hdr += struct.pack("<q", 0) + struct.pack("<I", 1)
    hdr += struct.pack("<I", 0) + b"\x00\x00\x00\x00"
    hdr += bytes([1]) + lacing
    page = bytes(hdr) + body
    page = page[:22] + struct.pack("<I", ogg_crc(page)) + page[26:]
    with pytest.raises(NotImplementedError, match="Vorbis"):
        demux_ogg_flac(page)


def test_truncations_refuse():
    _pcm, native = _native(128)
    ogg = mux_ogg_flac(native)
    with pytest.raises(ValueError):
        demux_ogg_flac(ogg[:30])
    with pytest.raises(ValueError):
        demux_ogg_flac(b"JUNK" + ogg)
    with pytest.raises(ValueError):
        demux_ogg_flac(b"OggS")


def test_mux_requires_native_flac():
    with pytest.raises(ValueError, match="native FLAC"):
        mux_ogg_flac(b"OggS whatever")
