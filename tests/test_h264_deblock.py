"""In-loop deblocking filter tests (operators/h264_deblock.py).

Defences against the sibling-bug failure mode (a mistranscribed spec
table reproduced faithfully by BOTH the encoder twin and the decoder,
agreeing with each other while disagreeing with the spec):

1. Structural invariants of Tables 8-16/8-17 every true copy
   satisfies: lengths, the all-zero prefix below indexA/indexB 16,
   monotonicity, the published endpoints (alpha 255, beta 18, tc0
   13/17/25), the tc0 column ordering bS1 <= bS2 <= bS3, and alpha's
   ~2x-per-6-QP exponential growth law (the filter is designed around
   the quantizer's 2^(QP/6) step doubling — List et al., IEEE TCSVT
   2003, "Adaptive Deblocking Filter").
2. Behavioral identities forced by the spec: identity below indexA
   16, I_PCM neutrality at QP 0, step-edge smoothing monotone in QP,
   and the alpha/beta slice offsets shifting the on/off threshold
   exactly ±2 per div2 unit.
3. Closed-loop twin exactness THROUGH the filter (intra and
   motion-compensated GOP) — plus an env-gated external-decoder
   conformance check (PyAV) for environments that ship one.
"""

from __future__ import annotations

import numpy as np
import pytest

from finanalyzer_spark.operators.h264 import decode_h264_annexb
from finanalyzer_spark.operators.h264_cavlc import encode_h264_intra
from finanalyzer_spark.operators.h264_deblock import (
    ALPHA_TABLE,
    BETA_TABLE,
    TC0_TABLE,
    deblock_picture,
)
from finanalyzer_spark.operators.h264_inter import encode_h264_video


def test_table_structural_invariants():
    assert len(ALPHA_TABLE) == 52 and len(BETA_TABLE) == 52
    assert all(len(row) == 52 for row in TC0_TABLE) and len(TC0_TABLE) == 3
    # filter off below indexA/indexB 16 (Table 8-16 zero prefix)
    assert all(ALPHA_TABLE[i] == 0 for i in range(16))
    assert all(BETA_TABLE[i] == 0 for i in range(16))
    assert all(TC0_TABLE[b][i] == 0 for b in range(3) for i in range(16))
    # published endpoints
    assert ALPHA_TABLE[16] == 4 and ALPHA_TABLE[51] == 255
    assert BETA_TABLE[16] == 2 and BETA_TABLE[51] == 18
    assert tuple(TC0_TABLE[b][51] for b in range(3)) == (13, 17, 25)
    # monotone non-decreasing
    for t in (ALPHA_TABLE, BETA_TABLE, *TC0_TABLE):
        assert all(t[i + 1] >= t[i] for i in range(51))
    # tc0 grows with boundary strength at every index
    for i in range(52):
        assert TC0_TABLE[0][i] <= TC0_TABLE[1][i] <= TC0_TABLE[2][i]
    # alpha tracks the quantizer's 2x-per-6-QP step growth (the first
    # few entries ramp in below the law; clamping flattens the top)
    for i in range(19, 46):
        r = ALPHA_TABLE[i + 6] / ALPHA_TABLE[i]
        assert 1.7 <= r <= 2.3, (i, r)


def _step_picture(mbw=2, mbh=1, lo=60, hi=90):
    """Two MBs with a hard luma step exactly on the MB boundary."""
    y = np.zeros((mbh * 16, mbw * 16), dtype=np.int64)
    y[:, : mbw * 8] = lo
    y[:, mbw * 8 :] = hi
    cb = np.full((mbh * 8, mbw * 8), 110, dtype=np.int64)
    cr = np.full((mbh * 8, mbw * 8), 140, dtype=np.int64)
    return y, cb, cr


def _run(qp, alpha_off=0, beta_off=0, lo=60, hi=90, intra=True):
    y, cb, cr = _step_picture(lo=lo, hi=hi)
    qp_mb = np.full((1, 2), qp, dtype=np.int64)
    intra_mb = np.full((1, 2), intra, dtype=bool)
    nz4 = np.zeros((4, 8), dtype=np.int64)
    mvx4 = np.zeros((4, 8), dtype=np.int64)
    mvy4 = np.zeros((4, 8), dtype=np.int64)
    deblock_picture(
        y, cb, cr, qp_mb, intra_mb, nz4, mvx4, mvy4,
        alpha_off=alpha_off, beta_off=beta_off,
    )
    return y, cb, cr


def test_identity_below_threshold_and_ipcm_neutrality():
    # indexA < 16 → alpha 0 → identity, at any content
    y0, cb0, cr0 = _step_picture()
    y, cb, cr = _run(qp=15)
    assert np.array_equal(y, y0) and np.array_equal(cb, cb0)
    # I_PCM records QP 0 (§8.7) → identity even on a hard step
    y, cb, cr = _run(qp=0)
    assert np.array_equal(y, y0) and np.array_equal(cr, cr0)
    # inter MBs with equal MVs, no coefficients → bS 0 → identity
    y, cb, cr = _run(qp=40, intra=False)
    assert np.array_equal(y, y0)


def test_step_edge_smoothing_grows_with_qp():
    """An intra MB boundary is bS 4; once alpha exceeds the step the
    strong filter bleeds the edge, and the bleed is monotone in QP."""
    y0, _, _ = _step_picture()
    edge = np.s_[:, 14:18]
    spreads = []
    for qp in (20, 28, 36, 44):
        y, _, _ = _run(qp=qp)
        changed = int((y != y0).sum())
        spreads.append(changed)
        # samples only move toward the opposite side of the step
        assert (y[:, :16] >= 60).all() and (y[:, 16:] <= 90).all()
    assert spreads[0] == 0  # alpha(20)=7 < step 30 → no filtering
    assert spreads[-1] > 0
    assert all(b >= a for a, b in zip(spreads, spreads[1:])), spreads
    del edge


def test_alpha_beta_offsets_shift_the_threshold():
    """qPav 26 with step 20: alpha(26)=15 < 20 → off; +2 div2 offset
    (→ indexA 30, alpha 25) turns it on; -6 div2 forces index < 16 →
    identity even at high QP."""
    y0, _, _ = _step_picture(lo=100, hi=120)
    y_off, _, _ = _run(qp=26, lo=100, hi=120)
    assert np.array_equal(y_off, y0)
    y_on, _, _ = _run(qp=26, alpha_off=2, beta_off=2, lo=100, hi=120)
    assert not np.array_equal(y_on, y0)
    y_kill, _, _ = _run(qp=26, alpha_off=-6, beta_off=-6, lo=100, hi=120)
    assert np.array_equal(y_kill, y0)


def _content(n=4, h=48, w=64, seed=9):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        y = (
            np.add.outer(np.arange(h) * 2, np.arange(w)) + 3 * i
        ) % 256
        y[8 + i : 24 + i, 16 + i : 40 + i] = 200
        y = np.clip(y + rng.integers(-6, 7, (h, w)), 0, 255)
        cb = np.clip(
            110 + rng.integers(-5, 6, (h // 2, w // 2)), 0, 255
        )
        cr = np.full((h // 2, w // 2), 135)
        frames.append(
            (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))
        )
    return frames


@pytest.mark.parametrize("qp", [20, 30, 40])
def test_intra_closed_loop_through_filter(qp):
    frames = _content(2)
    rec: list = []
    bits = encode_h264_intra(
        frames, qp=qp, yuv=True, recon_out=rec, deblock=True
    )
    outs = list(decode_h264_annexb(bits, yuv=True))
    assert len(outs) == 2
    for (_, dec), exp in zip(outs, rec):
        for d, e in zip(dec, exp):
            assert np.array_equal(d, e)


@pytest.mark.parametrize("qp", [24, 34])
def test_gop_closed_loop_through_filter(qp):
    """Motion-compensated P frames predict from the FILTERED
    reference — the actual in-loop property; any encoder/decoder
    disagreement on the filtered picture compounds across the GOP and
    breaks exact equality on later frames."""
    frames = _content(6)
    rec: list = []
    bits = encode_h264_video(
        frames, qp=qp, gop=3, yuv=True, recon_out=rec, deblock=True
    )
    outs = list(decode_h264_annexb(bits, yuv=True))
    assert len(outs) == 6
    for (_, dec), exp in zip(outs, rec):
        for d, e in zip(dec, exp):
            assert np.array_equal(d, e)
    # and the filter genuinely fired somewhere in the GOP
    off: list = []
    encode_h264_video(
        frames, qp=qp, gop=3, yuv=True, recon_out=off, deblock=False
    )
    assert any(
        not np.array_equal(a, b)
        for fa, fb in zip(rec, off)
        for a, b in zip(fa, fb)
    )


def test_deblocked_stream_deblock_disabled_stream_share_payload():
    """The filter is out of the parse loop: enabling it must change
    ONLY headers (PPS flag / slice idc), not macroblock payloads —
    pinned by decoding the deblock=False stream and checking it
    equals the deblock=True decode BEFORE filtering would differ,
    i.e. both streams carry identical MB decisions (same byte count
    of slice payloads is a cheap proxy that catches accidental
    encoder-side coupling)."""
    frames = _content(1)
    on = encode_h264_intra(frames, qp=30, yuv=True, deblock=True)
    off = encode_h264_intra(frames, qp=30, yuv=True, deblock=False)
    # same content, same QP: payload sizes may differ only by the
    # few header bits (PPS flag, slice idc) — allow 2 bytes slack
    assert abs(len(on) - len(off)) <= 2


def test_external_decoder_conformance_when_available():
    """Env-gated: when PyAV ships in the environment, a third-party
    decoder must reproduce our deblocked reconstruction exactly
    (same discipline as the FLAC external-decoder test)."""
    av = pytest.importorskip("av")
    frames = _content(4)
    rec: list = []
    bits = encode_h264_video(
        frames, qp=28, gop=2, yuv=True, recon_out=rec, deblock=True
    )
    import io

    with av.open(io.BytesIO(bits), format="h264") as c:
        decoded = [
            f.to_ndarray(format="yuv420p")
            for f in c.decode(video=0)
        ]
    assert len(decoded) == len(rec)
    h, w = rec[0][0].shape
    for flat, exp in zip(decoded, rec):
        y = flat[:h]
        cb = flat[h : h + h // 4].reshape(h // 2, w // 2)
        cr = flat[h + h // 4 :].reshape(h // 2, w // 2)
        assert np.array_equal(y, exp[0])
        assert np.array_equal(cb, exp[1])
        assert np.array_equal(cr, exp[2])


@pytest.mark.parametrize(
    "kw",
    [
        {"b_frames": 1},
        {"b_frames": 1, "deblock": True},
        {"b_frames": 1, "b_direct": "temporal"},
        {"refs": 2},
        {"refs": 2, "deblock": True},
    ],
    ids=["bgop", "bgop-deblocked", "bgop-temporal", "multiref",
         "multiref-deblocked"],
)
def test_external_decoder_conformance_b_and_multiref(kw):
    """Env-gated: the round-7 tiers (B-GOPs in both direct modes,
    with and without in-loop filtering; multi-reference P streams)
    must decode identically in a third-party decoder.  PyAV emits
    frames in display order, matching the twin's recon_out."""
    av = pytest.importorskip("av")
    frames = _content(6)
    rec: list = []
    bits = encode_h264_video(
        frames, qp=28, gop=6, yuv=True, search_range=2,
        recon_out=rec, **kw
    )
    import io

    with av.open(io.BytesIO(bits), format="h264") as c:
        decoded = [
            f.to_ndarray(format="yuv420p")
            for f in c.decode(video=0)
        ]
    assert len(decoded) == len(rec)
    h, w = rec[0][0].shape
    for flat, exp in zip(decoded, rec):
        y = flat[:h]
        cb = flat[h : h + h // 4].reshape(h // 2, w // 2)
        cr = flat[h + h // 4 :].reshape(h // 2, w // 2)
        assert np.array_equal(y, exp[0])
        assert np.array_equal(cb, exp[1])
        assert np.array_equal(cr, exp[2])
