"""G.711 mu-law / A-law (operators/g711.py): EXHAUSTIVE conformance
against CPython's `audioop` C implementation (the Sun g711.c
reference) — all 65 536 int16 inputs per encoder, all 256 codes per
decoder — plus algebraic invariants that hold without audioop, and
the pinned oracle decode tables."""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from finanalyzer_spark.operators.g711 import (
    ALAW_DECODE_TABLE,
    ULAW_DECODE_TABLE,
    alaw_decode,
    alaw_encode,
    ulaw_decode,
    ulaw_encode,
)

try:  # removed in Python 3.13 — conformance runs where it exists
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
except ImportError:  # pragma: no cover
    audioop = None

needs_audioop = pytest.mark.skipif(
    audioop is None, reason="audioop (C reference) not available"
)

ALL_PCM = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


@needs_audioop
def test_ulaw_encode_exhaustive_vs_c_reference():
    ref = np.frombuffer(audioop.lin2ulaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(ulaw_encode(ALL_PCM), ref)


@needs_audioop
def test_ulaw_decode_exhaustive_vs_c_reference():
    ref = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), np.int16)
    assert np.array_equal(ulaw_decode(ALL_CODES), ref)


@needs_audioop
def test_alaw_encode_exhaustive_vs_c_reference():
    ref = np.frombuffer(audioop.lin2alaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(alaw_encode(ALL_PCM), ref)


@needs_audioop
def test_alaw_decode_exhaustive_vs_c_reference():
    ref = np.frombuffer(audioop.alaw2lin(ALL_CODES.tobytes(), 2), np.int16)
    assert np.array_equal(alaw_decode(ALL_CODES), ref)


# ------------------------------------------------- reference-free laws

def test_decoders_bijective_on_magnitude_codes():
    """Each law's decoder maps the 256 codes onto 256 distinct int16
    values except the two mu-law zero codes (0x7F/0xFF both decode to
    0 — a property of the spec table)."""
    u = ulaw_decode(ALL_CODES)
    a = alaw_decode(ALL_CODES)
    assert len(np.unique(u)) == 255  # +0 and -0 collapse
    assert len(np.unique(a)) == 256


def test_roundtrip_is_identity_on_decoder_range():
    """encode(decode(code)) == code for every code except mu-law's
    positive zero: decode(0x7F) = 0 and zero re-encodes to 0xFF (the
    Sun implementation maps non-negative inputs through mask 0xFF), a
    quirk shared bit-for-bit with the C reference."""
    u = ulaw_encode(ulaw_decode(ALL_CODES))
    mismatch = np.nonzero(u != ALL_CODES)[0]
    assert mismatch.tolist() == [0x7F]
    assert u[0x7F] == 0xFF
    a = alaw_encode(alaw_decode(ALL_CODES))
    assert np.array_equal(a, ALL_CODES)


def test_quantization_error_bounded_by_segment_step():
    """|decode(encode(x)) - x| is bounded by half the largest segment
    step (mu: 256 at 14-bit top segment -> 1024 in 16-bit; A: 1024)."""
    for enc, dec, bound in (
        (ulaw_encode, ulaw_decode, 1024),
        (alaw_encode, alaw_decode, 1024),
    ):
        err = np.abs(
            dec(enc(ALL_PCM)).astype(np.int32) - ALL_PCM.astype(np.int32)
        )
        # clipping region at the extremes is excluded from the step bound
        core = (ALL_PCM > -32000) & (ALL_PCM < 32000)
        assert err[core].max() <= bound


def test_decode_table_antisymmetry():
    """Flipping the sign bit of a code negates the decoded level, for
    every code of both laws (the encoders are NOT sign-symmetric —
    the reference floors negatives via arithmetic shift — but the
    decode tables are exactly antisymmetric, a spec-table property)."""
    u = ulaw_decode(ALL_CODES)
    a = alaw_decode(ALL_CODES)
    assert np.array_equal(u[ALL_CODES ^ 0x80], -u)
    assert np.array_equal(a[ALL_CODES ^ 0x80], -a)


def test_pinned_tables_match_decoders():
    assert list(ULAW_DECODE_TABLE) == ulaw_decode(ALL_CODES).tolist()
    assert list(ALAW_DECODE_TABLE) == alaw_decode(ALL_CODES).tolist()
    # spot-pin spec landmarks: code 0 is the most negative level
    assert ULAW_DECODE_TABLE[0] == -32124
    assert ULAW_DECODE_TABLE[0x7F] == 0
    assert ALAW_DECODE_TABLE[0x55] == -8  # 0x55 mask ^ 0 -> smallest step
