"""Sun AU + AIFF/AIFC containers (operators/aiffau.py): genuinely
foreign fixtures (the CPython test suite's Audacity-written pluck-*
files) decoded cross-container, G.711 payloads checked EXACTLY against
the audioop C reference, encoder-twin round trips, and
exact-or-refuse failure behavior.

The pluck fixtures were exported per-container with independent
dither, so PCM cross-container checks assert a tight bounded
difference (<= 16 LSB for 16-bit; any endianness/offset/layout bug is
thousands of LSB off), while the companded payloads — where our
decoder IS the codec — are checked bit-exactly."""

from __future__ import annotations

import os
import struct
import warnings

import numpy as np
import pytest

from finanalyzer_spark.operators.aiffau import (
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
)
from finanalyzer_spark.operators.g711 import alaw_decode, ulaw_decode
from finanalyzer_spark.operators.multimodal import decode_wav

_AUDIODATA = (
    "/root/.pyenv/versions/3.11.7/lib/python3.11/test/audiodata"
)


def _foreign(name: str) -> bytes:
    p = os.path.join(_AUDIODATA, name)
    if not os.path.exists(p):  # pragma: no cover
        pytest.skip("stdlib audio fixture not present")
    return open(p, "rb").read()


# ---------------------------------------------------------------- foreign

def test_foreign_pcm16_three_containers_agree():
    """pluck-pcm16 in .wav / .au / .aiff through three independent
    decoders: same rate, same shape, samples within dither distance."""
    rw, sw = decode_wav(_foreign("pluck-pcm16.wav"))
    ra, sa = decode_au(_foreign("pluck-pcm16.au"))
    rf, sf = decode_aiff(_foreign("pluck-pcm16.aiff"))
    assert rw == ra == rf == 11025
    assert sw.shape == sa.shape == sf.shape == (3307, 2)
    assert np.abs(sw.astype(int) - sa.astype(int)).max() <= 16
    assert np.abs(sw.astype(int) - sf.astype(int)).max() <= 16


@pytest.mark.parametrize("fmt", ["au", "aiff"])
def test_foreign_pcm_depth_ladder(fmt):
    """8/24/32-bit variants decode to the 16-bit top bits: within
    8-bit quantization distance of the pcm16 file for pcm8, within
    truncation+dither distance for pcm24/32."""
    dec = decode_au if fmt == "au" else decode_aiff
    _, s16 = dec(_foreign(f"pluck-pcm16.{fmt}"))
    _, s24 = dec(_foreign(f"pluck-pcm24.{fmt}"))
    _, s32 = dec(_foreign(f"pluck-pcm32.{fmt}"))
    _, s8 = dec(_foreign(f"pluck-pcm8.{fmt}"))
    assert s24.shape == s32.shape == s8.shape == s16.shape
    assert np.abs(s24.astype(int) - s16.astype(int)).max() <= 16
    assert np.abs(s32.astype(int) - s16.astype(int)).max() <= 16
    assert np.abs(s8.astype(int) - s16.astype(int)).max() <= 512


def test_foreign_ulaw_au_payload_decodes_exactly():
    """The .au ulaw file's payload, expanded by our G.711 decoder,
    must match the container decode bit-for-bit (and, where audioop
    exists, the C reference — covered exhaustively in test_g711)."""
    buf = _foreign("pluck-ulaw.au")
    rate, s = decode_au(buf)
    assert rate == 11025 and s.shape == (3307, 2)
    ref = ulaw_decode(np.frombuffer(buf[24:], dtype=np.uint8)).reshape(-1, 2)
    assert np.array_equal(s, ref)
    # quantization distance from the PCM master stays within one
    # mu-law top-segment step
    _, s16 = decode_au(_foreign("pluck-pcm16.au"))
    assert np.abs(s.astype(int) - s16.astype(int)).max() <= 1024


@pytest.mark.parametrize(
    "name,law", [("pluck-ulaw.aifc", ulaw_decode), ("pluck-alaw.aifc", alaw_decode)]
)
def test_foreign_aifc_compressed_variants(name, law):
    buf = _foreign(name)
    rate, s = decode_aiff(buf)
    assert rate == 11025 and s.shape == (3307, 2)
    # locate SSND payload independently and expand with the raw codec
    pos = 12
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack(">I", buf[pos + 4 : pos + 8])
        if cid == b"SSND":
            (off,) = struct.unpack(">I", buf[pos + 8 : pos + 12])
            data = buf[pos + 16 + off : pos + 8 + size]
        pos += 8 + size + (size & 1)
    ref = law(np.frombuffer(data, dtype=np.uint8)).reshape(-1, 2)
    assert np.array_equal(s, ref[: len(s)])
    _, s16 = decode_aiff(_foreign("pluck-pcm16.aiff"))
    assert np.abs(s.astype(int) - s16.astype(int)).max() <= 1024


# ------------------------------------------------------------ round trips

_PCM = (np.sin(np.arange(3000) * 0.07) * 11000).astype(np.int16)


@pytest.mark.parametrize("encoding", ["pcm16", "ulaw", "alaw"])
def test_au_roundtrip(encoding):
    rate, s = decode_au(encode_au(_PCM, 16000, 1, encoding))
    assert rate == 16000 and s.shape == (3000, 1)
    if encoding == "pcm16":
        assert np.array_equal(s.ravel(), _PCM)
    else:
        assert np.abs(s.ravel().astype(int) - _PCM.astype(int)).max() <= 1024


@pytest.mark.parametrize("compression", ["none", "ulaw", "alaw"])
def test_aiff_roundtrip(compression):
    buf = encode_aiff(_PCM, 44100, 1, compression)
    rate, s = decode_aiff(buf)
    assert rate == 44100 and s.shape == (3000, 1)
    if compression == "none":
        assert buf[8:12] == b"AIFF"
        assert np.array_equal(s.ravel(), _PCM)
    else:
        assert buf[8:12] == b"AIFC"
        assert np.abs(s.ravel().astype(int) - _PCM.astype(int)).max() <= 1024


def test_stereo_roundtrip_interleave():
    st = np.stack([_PCM, -_PCM], axis=1)  # (n, 2)
    rate, s = decode_au(encode_au(st.ravel(), 8000, 2))
    assert s.shape == st.shape and np.array_equal(s, st)
    rate, s = decode_aiff(encode_aiff(st.ravel(), 8000, 2))
    assert s.shape == st.shape and np.array_equal(s, st)


def test_companded_roundtrip_matches_raw_codec():
    """Container round trip equals codec round trip sample-for-sample
    (the container adds no resampling or scaling)."""
    from finanalyzer_spark.operators.g711 import (
        alaw_encode,
        ulaw_encode,
    )

    _, s = decode_au(encode_au(_PCM, 8000, 1, "ulaw"))
    assert np.array_equal(s.ravel(), ulaw_decode(ulaw_encode(_PCM)))
    _, s = decode_aiff(encode_aiff(_PCM, 8000, 1, "alaw"))
    assert np.array_equal(s.ravel(), alaw_decode(alaw_encode(_PCM)))


# ------------------------------------------------------- exact-or-refuse

def test_refusals_and_errors():
    with pytest.raises(ValueError, match="not a Sun AU"):
        decode_au(b"RIFF" + b"\x00" * 40)
    with pytest.raises(ValueError, match="truncated"):
        decode_au(b".snd\x00\x00\x00\x18")
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b".snd" + b"\x00" * 40)
    # unsupported AU encoding id (23 = G.721 ADPCM)
    bad = b".snd" + struct.pack(">IIIII", 24, 4, 23, 8000, 1) + b"\0\0\0\0"
    with pytest.raises(NotImplementedError, match="encoding 23"):
        decode_au(bad)
    # unsupported AIFC compression type
    comm = struct.pack(">hIh", 1, 1, 16) + b"\x40\x0c\xac\x44" + b"\x00" * 6
    comm += b"ima4" + b"\x00\x00"
    buf = (
        b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 16) + b"AIFC"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", 8) + struct.pack(">II", 0, 0)
    )
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(buf)
    with pytest.raises(NotImplementedError):
        encode_au(_PCM, encoding="adpcm")
    with pytest.raises(NotImplementedError):
        encode_aiff(_PCM, compression="sowt")


# ------------------------------------------------- WAV depth ladder

def test_foreign_wav_pcm_depth_ladder():
    """pluck-pcm8/24/32.wav (foreign Audacity exports) decode through
    the extended WAV path to the 16-bit top bits: 8-bit (unsigned in
    WAV, unlike AU/AIFF) within quantization distance, 24/32-bit
    within truncation+dither distance of the pcm16 master."""
    from finanalyzer_spark.operators.multimodal import decode_wav

    _, s16 = decode_wav(_foreign("pluck-pcm16.wav"))
    for name, bound in (
        ("pluck-pcm8.wav", 512),
        ("pluck-pcm24.wav", 16),
        ("pluck-pcm32.wav", 16),
    ):
        rate, s = decode_wav(_foreign(name))
        assert rate == 11025 and s.shape == s16.shape
        assert np.abs(s.astype(int) - s16.astype(int)).max() <= bound


def test_wav_alaw_and_float32_roundtrip():
    """Hand-built tag-6 (A-law) and tag-3 (float32) WAVs decode to the
    C-reference expansion / the scaled-int16 of the payload."""
    import struct

    from finanalyzer_spark.operators.g711 import alaw_decode, alaw_encode
    from finanalyzer_spark.operators.multimodal import decode_wav

    def wav(fmt, bits, payload, channels=1, rate=8000):
        ba = channels * max(bits // 8, 1)
        fmtc = struct.pack(
            "<HHIIHH", fmt, channels, rate, rate * ba, ba, bits
        )
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmtc)) + fmtc
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + body

    codes = alaw_encode(_PCM)
    rate, s = decode_wav(wav(6, 8, codes.tobytes()))
    assert rate == 8000
    assert np.array_equal(s.ravel(), alaw_decode(codes))

    f32 = (_PCM.astype(np.float64) / 32767.0).astype("<f4")
    rate, s = decode_wav(wav(3, 32, f32.tobytes()))
    want = np.clip(
        np.round(f32.astype(np.float64) * 32767.0), -32768, 32767
    ).astype(np.int16)
    assert np.array_equal(s.ravel(), want)

    # 8-bit PCM is unsigned with a 128 bias
    u8 = ((_PCM.astype(np.int32) >> 8) + 128).astype(np.uint8)
    rate, s = decode_wav(wav(1, 8, u8.tobytes()))
    assert np.array_equal(
        s.ravel(), ((u8.astype(np.int16) - 128) << 8)
    )
