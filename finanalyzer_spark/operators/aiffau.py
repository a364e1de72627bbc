"""Sun AU (.au/.snd) and Apple AIFF / AIFF-C audio containers.

Pure-python decoders/encoders for the two classic big-endian audio
containers, completing the media tier's audio-container matrix
alongside RIFF/WAVE (operators/multimodal.py) and FLAC
(operators/flac.py).  Linear PCM at 8/16/24/32-bit plus the G.711
mu-law / A-law companded encodings (operators/g711.py, audioop-exact).

Certified against **genuinely foreign files**: the CPython test
suite's `pluck-*.au` / `pluck-*.aiff` / `pluck-*.aifc` fixtures
(written by Audacity, not by this repo) carry the same recording in
every container/depth, so tests assert cross-container sample
identity — .wav == .au == .aiff for the same depth through three
independent decoders, and ulaw/alaw variants match the C-reference
expansion of their payloads (tests/test_aiffau.py).

Contract matches decode_wav: ``decode_*(buf) -> (rate, samples)``
with samples int16 shaped (n_frames, n_channels); 24/32-bit PCM is
reduced to the top 16 bits, 8-bit (signed in both formats) widened
by << 8.

AU header (Sun/NeXT, public spec): magic ``.snd``, 32-bit BE fields
offset / data-size / encoding / rate / channels.  Encodings handled:
1 ulaw, 2 pcm8, 3 pcm16, 4 pcm24, 5 pcm32, 27 alaw.

AIFF (Apple EA IFF 85): FORM/AIFF with COMM (channels, frames,
sample size, rate as an 80-bit IEEE 754 extended float) and SSND
(offset, block size, data).  AIFF-C adds FVER and a COMM compression
type; ``NONE``/``sowt`` (little-endian pcm16) /``ulaw``/``alaw`` are
handled, anything else raises NotImplementedError (exact-or-refuse).
"""

from __future__ import annotations

import struct

import numpy as np

from .g711 import alaw_decode, alaw_encode, ulaw_decode, ulaw_encode

_AU_MAGIC = b".snd"
#: AU encoding id -> (bytes/sample, kind)
_AU_ENCODINGS = {
    1: (1, "ulaw"),
    2: (1, "pcm8"),
    3: (2, "pcm16"),
    4: (3, "pcm24"),
    5: (4, "pcm32"),
    27: (1, "alaw"),
}


def _pcm_be_to_int16(data: bytes, sample_bytes: int) -> np.ndarray:
    """Big-endian linear PCM of 1/2/3/4 bytes -> int16 (top 16 bits)."""
    n = len(data) // sample_bytes
    data = data[: n * sample_bytes]
    if sample_bytes == 1:
        return (np.frombuffer(data, dtype=np.int8).astype(np.int16)) << 8
    if sample_bytes == 2:
        return np.frombuffer(data, dtype=">i2").astype(np.int16)
    a = np.frombuffer(data, dtype=np.uint8).reshape(n, sample_bytes)
    # top two bytes form the int16 (sign from the first byte)
    hi = a[:, 0].astype(np.int8).astype(np.int32) << 8
    return (hi | a[:, 1]).astype(np.int16)


def decode_au(buf: bytes):
    """Sun AU -> (rate, int16 samples (n, channels)). ValueError on a
    non-AU payload; NotImplementedError for unhandled encodings."""
    if buf[:4] != _AU_MAGIC:
        raise ValueError("not a Sun AU payload")
    if len(buf) < 24:
        raise ValueError("AU header truncated")
    offset, size, enc, rate, channels = struct.unpack(">IIIII", buf[4:24])
    if channels == 0:
        raise ValueError("AU header declares 0 channels")
    if offset < 24 or offset > len(buf):
        raise ValueError("AU data offset out of range")
    if enc not in _AU_ENCODINGS:
        raise NotImplementedError(f"AU encoding {enc} not supported")
    sample_bytes, kind = _AU_ENCODINGS[enc]
    data = buf[offset:]
    if size != 0xFFFFFFFF:  # ~0 means "unknown, read to EOF"
        if len(data) < size:
            raise ValueError(
                f"AU payload truncated: header declares {size} bytes,"
                f" {len(data)} available"
            )
        data = data[:size]
    if kind == "ulaw":
        flat = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif kind == "alaw":
        flat = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    else:
        flat = _pcm_be_to_int16(data, sample_bytes)
    n = (len(flat) // channels) * channels
    return rate, flat[:n].reshape(-1, channels)


def encode_au(pcm16, rate: int = 8000, channels: int = 1,
              encoding: str = "pcm16") -> bytes:
    """int16 samples -> Sun AU bytes (encoder twin for the decoder).

    encoding: 'pcm16' (lossless) | 'ulaw' | 'alaw' (G.711 companded)."""
    arr = np.asarray(pcm16, dtype=np.int16).reshape(-1)
    if encoding == "pcm16":
        enc, payload = 3, arr.astype(">i2").tobytes()
    elif encoding == "ulaw":
        enc, payload = 1, ulaw_encode(arr).tobytes()
    elif encoding == "alaw":
        enc, payload = 27, alaw_encode(arr).tobytes()
    else:
        raise NotImplementedError(f"AU encoding {encoding!r} not supported")
    head = _AU_MAGIC + struct.pack(
        ">IIIII", 24, len(payload), enc, rate, channels
    )
    return head + payload


# ---------------------------------------------------------------- AIFF

def _x80_to_int(b: bytes) -> int:
    """80-bit IEEE 754 extended float -> int (sample rates are whole
    numbers in practice; rounds to nearest)."""
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:], "big")
    sign = -1 if se & 0x8000 else 1
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    # value = mant * 2^(exp - 16383 - 63)
    shift = exp - 16383 - 63
    if shift >= 0:
        return sign * (mant << shift)
    half = 1 << (-shift - 1)
    return sign * ((mant + half) >> -shift)


def _int_to_x80(v: int) -> bytes:
    """int -> 80-bit IEEE extended (normalized, for COMM sample rate)."""
    if v == 0:
        return b"\x00" * 10
    exp = v.bit_length() - 1
    mant = v << (63 - exp)
    return struct.pack(">H", exp + 16383) + mant.to_bytes(8, "big")


def decode_aiff(buf: bytes):
    """AIFF / AIFF-C -> (rate, int16 samples (n, channels)).

    Handles PCM 8/16/24/32 (big-endian; AIFC 'sowt' little-endian 16)
    and AIFC 'ulaw'/'alaw' (G.711).  ValueError on a non-AIFF payload;
    NotImplementedError for other compression types."""
    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] not in (
        b"AIFF", b"AIFC"
    ):
        raise ValueError("not an AIFF/AIFC payload")
    is_aifc = buf[8:12] == b"AIFC"
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack(">I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if len(comm) < 18:
        raise ValueError("COMM chunk truncated")
    channels, nframes, bits = struct.unpack(">hIh", comm[:8])
    rate = _x80_to_int(comm[8:18])
    comp = b"NONE"
    if is_aifc and len(comm) >= 22:
        comp = comm[18:22]
    if channels <= 0:
        raise ValueError("COMM declares no channels")
    if len(ssnd) < 8:
        raise ValueError("SSND chunk truncated")
    (off,) = struct.unpack(">I", ssnd[:4])
    data = ssnd[8 + off :]
    if comp == b"ulaw":
        flat = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif comp == b"alaw":
        flat = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif comp == b"sowt":  # little-endian pcm16 (Apple QuickTime)
        n = len(data) // 2
        flat = np.frombuffer(data[: n * 2], dtype="<i2").astype(np.int16)
    elif comp == b"NONE":
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(f"AIFF sample size {bits} unsupported")
        flat = _pcm_be_to_int16(data, bits // 8)
    else:
        raise NotImplementedError(
            f"AIFC compression {comp!r} not supported"
        )
    n = min((len(flat) // channels), nframes) * channels
    return rate, flat[:n].reshape(-1, channels)


def encode_aiff(pcm16, rate: int = 8000, channels: int = 1,
                compression: str = "none") -> bytes:
    """int16 samples -> AIFF (pcm16) or AIFF-C (ulaw/alaw) bytes."""
    arr = np.asarray(pcm16, dtype=np.int16).reshape(-1, )
    nframes = len(arr) // channels
    if compression == "none":
        form, payload, bits, extra = b"AIFF", arr.astype(">i2").tobytes(), 16, b""
    elif compression in ("ulaw", "alaw"):
        enc = ulaw_encode if compression == "ulaw" else alaw_encode
        payload = enc(arr).tobytes()
        bits = 16  # size before compression, per the AIFC spec
        name = b"\x04" + compression.encode() + b"\x00"  # pascal pad
        extra = compression.encode() + name
        form = b"AIFC"
    else:
        raise NotImplementedError(
            f"AIFF compression {compression!r} not supported"
        )
    comm = struct.pack(">hIh", channels, nframes, bits) + _int_to_x80(
        int(rate)
    ) + extra
    if len(comm) & 1:
        comm += b"\x00"
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks = b""
    if form == b"AIFC":
        chunks += b"FVER" + struct.pack(">II", 4, 0xA2805140)
    chunks += b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(chunks) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form + chunks
