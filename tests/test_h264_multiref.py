"""Multi-reference P-slice tests: te(v) ref_idx parse, refIdx-aware
MV prediction (8.4.1.3 same-reference rules become real), per-
partition reference selection, RefPicList0 ordering, deblocking's
different-reference boundary strength, and the encoder twin's
multi-reference rate-distortion search.

Validation strategy mirrors the P/B tiers: closed loops bit-for-bit
through the decoder's own reconstruction path; a hand-written stream
mixing references across macroblock shapes verified against a
test-side reconstruction from the unit primitives; byte-identity of
the refs=1 path as the regression guard.
"""

from __future__ import annotations

import numpy as np
import pytest

from finanalyzer_spark.operators.h264 import (
    _BitWriter,
    _nal,
    decode_h264_annexb,
    parse_sps,
    split_annexb,
)
from finanalyzer_spark.operators.h264_inter import (
    MvField,
    encode_h264_video,
    mc_chroma,
    mc_luma,
    predict_mv_part,
    skip_mv,
)

YS, XS = np.mgrid[0:32, 0:48]
BASE = ((YS * 3 + XS * 5) % 256).astype(np.uint8)


def _frame(i: int, roll: int):
    return (
        np.roll(BASE, roll, axis=1)[:, :32].copy(),
        np.full((16, 16), (40 + i) % 256, np.uint8),
        np.full((16, 16), (90 - i) % 256, np.uint8),
    )


def _oscillating(n: int):
    """Frame i matches frame i-2 better than i-1: reference 1 wins."""
    return [_frame(i, (i % 2) * 4) for i in range(n)]


@pytest.mark.parametrize("qp", [22, 28])
@pytest.mark.parametrize("deblock", [False, True])
def test_multiref_closed_loop(qp, deblock):
    frames = _oscillating(6)
    recon: list = []
    stream = encode_h264_video(
        frames, qp=qp, gop=6, yuv=True, search_range=2,
        recon_out=recon, refs=2, deblock=deblock,
    )
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == 6
    for (_fn, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)


def test_refs1_stream_byte_identical():
    frames = _oscillating(4)
    a = encode_h264_video(frames, qp=26, gop=4, yuv=True, search_range=2)
    b = encode_h264_video(
        frames, qp=26, gop=4, yuv=True, search_range=2, refs=1
    )
    assert a == b


def test_second_reference_wins_on_oscillation():
    frames = _oscillating(6)
    one = encode_h264_video(frames, qp=26, gop=6, yuv=True, search_range=2)
    two = encode_h264_video(
        frames, qp=26, gop=6, yuv=True, search_range=2, refs=2
    )
    # frame i equals frame i-2 exactly: with two references the
    # encoder finds the zero-residual predictor, with one it cannot
    assert len(two) < len(one)
    for t, _r, rbsp in split_annexb(two):
        if t == 7:
            sps = parse_sps(rbsp)
            assert sps["num_ref_frames"] == 2
            break


def test_encoder_refs_validation():
    frames = _oscillating(4)
    with pytest.raises(ValueError, match="refs must be"):
        encode_h264_video(frames, yuv=True, refs=0)
    with pytest.raises(ValueError, match="P-GOP"):
        encode_h264_video(frames, yuv=True, refs=2, b_frames=1)
    with pytest.raises(ValueError, match="weighted prediction"):
        encode_h264_video(frames, yuv=True, refs=2, wp=(1, 3, 2))


def test_refidx_aware_mv_prediction_rules():
    # predicting the MB at grid (4, 4): A = left MB (ref 0), B =
    # above MB (ref 1), C unavailable → D = above-left (intra)
    f2 = MvField(2, 2)
    f2.put_inter(4, 0, 4, 4, (8, 0), ref_idx=0)     # left MB, ref 0
    f2.put_inter(0, 4, 4, 4, (0, 8), ref_idx=1)     # above MB, ref 1
    f2.put_intra(0, 0, 4, 4)                        # above-left intra
    # exactly ONE neighbour on ref 0 (A) → its MV verbatim
    assert predict_mv_part(f2, 4, 4, 4, ref_idx=0) == (8, 0)
    # exactly ONE neighbour on ref 1 (B) → its MV verbatim
    assert predict_mv_part(f2, 4, 4, 4, ref_idx=1) == (0, 8)
    # directional rule requires the SAME reference: a 16x8 top
    # partition whose B neighbour sits on another ref falls back to
    # the 8.4.1.3.1 process — whose exactly-one-same-ref shortcut
    # then picks A (the only ref-0 neighbour)
    assert predict_mv_part(f2, 4, 4, 4, "B", ref_idx=0) == (8, 0)
    # matching reference → directional neighbour wins directly
    assert predict_mv_part(f2, 4, 4, 4, "B", ref_idx=1) == (0, 8)
    # no neighbour on the requested ref at all → pure median of the
    # raw neighbour MVs (A=(8,0), B=(0,8), D=(0,0) per component)
    f3 = MvField(2, 2)
    f3.put_inter(4, 0, 4, 4, (8, 0), ref_idx=1)
    f3.put_inter(0, 4, 4, 4, (0, 8), ref_idx=1)
    f3.put_intra(0, 0, 4, 4)
    assert predict_mv_part(f3, 4, 4, 4, ref_idx=0) == (0, 0)


def test_skip_mv_requires_ref0_for_zero_rule():
    f = MvField(2, 2)
    # left neighbour: zero MV but on reference 1 → the 8.4.1.1 zero
    # rule must NOT trigger off it
    f.put_inter(4, 0, 4, 4, (0, 0), ref_idx=1)
    f.put_inter(0, 4, 4, 4, (6, 2), ref_idx=0)  # above: ref 0, nonzero
    mv = skip_mv(f, 1, 1)
    assert mv != (0, 0)
    # same geometry with the left neighbour on ref 0 → zero rule fires
    f.put_inter(4, 0, 4, 4, (0, 0), ref_idx=0)
    assert skip_mv(f, 1, 1) == (0, 0)


def _two_ref_prefix():
    """SPS/PPS/IDR/P prefix of a refs=2 stream (PPS default 2 active)
    plus the two decoded reference pictures in RefPicList0 order
    (most recent first)."""
    frames = [_frame(0, 0), _frame(0, 2), _frame(0, 4)]
    stream = encode_h264_video(
        frames, qp=26, gop=3, yuv=True, search_range=2, refs=2
    )
    nals = [n for n in stream.split(b"\x00\x00\x00\x01") if n]
    kept = nals[:4]  # SPS PPS IDR P — drop the second P
    prefix = b"".join(b"\x00\x00\x00\x01" + n for n in kept)
    decoded = list(decode_h264_annexb(prefix, yuv=True))
    assert len(decoded) == 2
    ref1 = tuple(p.astype(np.int64) for p in decoded[0][1])  # IDR
    ref0 = tuple(p.astype(np.int64) for p in decoded[1][1])  # P (recent)
    return prefix, ref0, ref1


def test_multiref_handcrafted_stream_decodes():
    """One hand-written P slice mixes references across every shape:
    P_L0_16x16 on ref 1 (te(v) inverted bit), P_L0_L0_16x8 with refs
    (1, 0), P_8x8 with per-quadrant refs (0, 1, 1, 0), and a trailing
    P_Skip (pinned to ref 0) — verified pixel-exact against a
    test-side reconstruction from the unit primitives."""
    prefix, ref0, ref1 = _two_ref_prefix()
    refs0 = [ref0, ref1]

    s = _BitWriter()
    s.ue(0)        # first_mb_in_slice
    s.ue(5)        # slice_type: P
    s.ue(0)        # pps_id
    s.u(2, 8)      # frame_num
    s.u(0, 1)      # num_ref_idx_active_override (PPS default 2)
    s.u(0, 1)      # ref_pic_list_modification_flag_l0
    s.u(0, 1)      # adaptive_ref_pic_marking_mode_flag
    s.se(0)        # slice_qp_delta
    s.ue(1)        # disable_deblocking_filter_idc
    # --- MB 0: P_L0_16x16 on reference 1 ---
    s.ue(0)        # mb_skip_run
    s.ue(0)        # mb_type
    s.u(0, 1)      # ref_idx_l0 te(v): cmax 1, inverted bit → 1
    mvd0 = (4, -2)
    s.se(mvd0[0])
    s.se(mvd0[1])
    s.ue(0)        # cbp 0
    # --- MB 1: P_L0_L0_16x8, refs (1, 0) ---
    s.ue(0)
    s.ue(1)
    s.u(0, 1)      # ref_idx part 0 → 1
    s.u(1, 1)      # ref_idx part 1 → 0
    mvd1 = [(2, 2), (-2, 4)]
    for dx, dy in mvd1:
        s.se(dx)
        s.se(dy)
    s.ue(0)
    # --- MB 2: P_8x8, quadrant refs (0, 1, 1, 0), all 8x8 subs ---
    s.ue(0)
    s.ue(3)
    for _ in range(4):
        s.ue(0)    # sub_mb_type P_L0_8x8
    for ri in (0, 1, 1, 0):
        s.u(1 - ri, 1)  # te(v) cmax 1
    mvd2 = [(4, 0), (0, 4), (-2, 2), (2, -2)]
    for dx, dy in mvd2:
        s.se(dx)
        s.se(dy)
    s.ue(0)
    # --- MB 3: trailing P_Skip ---
    s.ue(1)
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))

    counts: list = []
    decoded = list(decode_h264_annexb(stream, yuv=True,
                                      counts_out=counts))
    assert [c["kind"] for c in counts] == ["I", "P", "P"]
    got_y, got_cb, got_cr = decoded[2][1]

    # ---- test-side expected reconstruction ----
    f = MvField(2, 2)
    exp_y = np.zeros((32, 32), np.int64)
    exp_cb = np.zeros((16, 16), np.int64)
    exp_cr = np.zeros((16, 16), np.int64)

    def paint(gx, gy, w4, h4, mv, ridx):
        bw, bh = w4 * 4, h4 * 4
        px, py = gx * 4, gy * 4
        ry, rcb, rcr = refs0[ridx]
        exp_y[py : py + bh, px : px + bw] = np.clip(
            mc_luma(ry, px, py, mv[0], mv[1], bh=bh, bw=bw), 0, 255
        )
        exp_cb[py // 2 : py // 2 + bh // 2,
               px // 2 : px // 2 + bw // 2] = np.clip(
            mc_chroma(rcb, px // 2, py // 2, mv[0], mv[1],
                      bh=bh // 2, bw=bw // 2), 0, 255
        )
        exp_cr[py // 2 : py // 2 + bh // 2,
               px // 2 : px // 2 + bw // 2] = np.clip(
            mc_chroma(rcr, px // 2, py // 2, mv[0], mv[1],
                      bh=bh // 2, bw=bw // 2), 0, 255
        )

    # MB 0: 16x16 ref 1
    mvp = predict_mv_part(f, 0, 0, 4, ref_idx=1)
    mv = (mvp[0] + mvd0[0], mvp[1] + mvd0[1])
    f.put_inter(0, 0, 4, 4, mv, ref_idx=1)
    paint(0, 0, 4, 4, mv, 1)
    # MB 1: 16x8 refs (1, 0) — directional B then A, ref-matched
    for (gy, dirn, ridx), mvd in zip(
        ((0, "B", 1), (2, "A", 0)), mvd1
    ):
        mvp = predict_mv_part(f, 4, gy, 4, dirn, ref_idx=ridx)
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        f.put_inter(gy, 4, 2, 4, mv, ref_idx=ridx)
        paint(4, gy, 4, 2, mv, ridx)
    # MB 2: P_8x8 quadrant refs (0, 1, 1, 0)
    for part, (ridx, mvd) in enumerate(zip((0, 1, 1, 0), mvd2)):
        qx, qy = (part & 1) * 2, 4 + (part >> 1) * 2
        mvp = predict_mv_part(f, qx, qy, 2, ref_idx=ridx)
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        f.put_inter(qy, qx, 2, 2, mv, ref_idx=ridx)
        paint(qx, qy, 2, 2, mv, ridx)
    # MB 3: P_Skip on ref 0
    mv = skip_mv(f, 1, 1)
    paint(4, 4, 4, 4, mv, 0)

    assert np.array_equal(got_y, exp_y.astype(np.uint8))
    assert np.array_equal(got_cb, exp_cb.astype(np.uint8))
    assert np.array_equal(got_cr, exp_cr.astype(np.uint8))


def test_active_count_beyond_dpb_fails_closed():
    prefix, _r0, _r1 = _two_ref_prefix()
    s = _BitWriter()
    s.ue(0)
    s.ue(5)
    s.ue(0)
    s.u(2, 8)
    s.u(1, 1)      # override
    s.ue(2)        # num_ref_idx_l0_active_minus1 → 3 active, dpb has 2
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))
    with pytest.raises(ValueError, match="exceeds the decoded"):
        list(decode_h264_annexb(stream, yuv=True))


def test_ref_list_modification_reorders_list0():
    """8.2.4.3.1 short-term re-ordering: an op moving the OLDER
    reference (the IDR) to the front makes ref_idx 0 mean that
    picture — a hand P slice predicting everything from list slot 0
    at zero motion must reproduce the IDR frame, not the recent P."""
    prefix, _ref0, _ref1 = _two_ref_prefix()
    s = _BitWriter()
    s.ue(0)        # first_mb_in_slice
    s.ue(5)        # slice_type: P
    s.ue(0)        # pps_id
    s.u(2, 8)      # frame_num (CurrPicNum = 2)
    s.u(0, 1)      # num_ref_idx_active_override (PPS default 2)
    s.u(1, 1)      # ref_pic_list_modification_flag_l0
    s.ue(0)        # idc 0: subtract
    s.ue(1)        # abs_diff_pic_num_minus1 → picNum 0 (the IDR)
    s.ue(3)        # idc 3: end of ops
    s.u(0, 1)      # adaptive_ref_pic_marking_mode_flag
    s.se(0)        # slice_qp_delta
    s.ue(1)        # disable_deblocking_filter_idc
    # all four MBs: P_L0_16x16 at list slot 0 (the re-ordered IDR),
    # zero mvd, no residual
    for _ in range(4):
        s.ue(0)    # mb_skip_run — NOTE: skip also predicts from
        s.ue(0)    # slot 0, but use explicit MBs for clarity
        s.u(1, 1)  # ref_idx_l0 te(v) → 0
        s.se(0)    # mvd x
        s.se(0)    # mvd y
        s.ue(0)    # cbp 0
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == 3
    idr_planes = decoded[0][1]
    got = decoded[2][1]
    for g, x in zip(got, idr_planes):
        assert np.array_equal(g, x)


def test_ref_list_modification_absent_picnum_fails_closed():
    prefix, _r0, _r1 = _two_ref_prefix()
    s = _BitWriter()
    s.ue(0)
    s.ue(5)
    s.ue(0)
    s.u(2, 8)
    s.u(0, 1)
    s.u(1, 1)      # modification flag
    s.ue(0)        # idc 0
    s.ue(4)        # abs_diff 5 → picNum -3 mod 256 = 253: not in DPB
    s.ue(3)
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))
    with pytest.raises(ValueError, match="PicNum absent"):
        list(decode_h264_annexb(stream, yuv=True))


def test_ref_list_modification_duplicate_picnum_refused():
    """8.2.4.3.1 can legally place ONE picture in TWO RefPicList0
    slots (the removal step only strips copies after the insertion
    point).  Our permutation-based list build and the ref_idx-proxy
    deblock bS rule (8.7.2.1) both assume distinct pictures per slot,
    so the tier must refuse, not silently mis-order the list."""
    prefix, _r0, _r1 = _two_ref_prefix()
    s = _BitWriter()
    s.ue(0)
    s.ue(5)
    s.ue(0)
    s.u(2, 8)
    s.u(0, 1)      # num_ref_idx_active_override (PPS default 2)
    s.u(1, 1)      # modification flag
    s.ue(0)        # idc 0: subtract
    s.ue(1)        # abs_diff 2 → picNum 0 (the IDR) to slot 0
    s.ue(1)        # idc 1: add
    s.ue(255)      # abs_diff 256 wraps MaxFrameNum → picNum 0 AGAIN
    s.ue(3)
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))
    with pytest.raises(NotImplementedError, match="duplicates a PicNum"):
        list(decode_h264_annexb(stream, yuv=True))


def test_long_term_modification_refused():
    prefix, _r0, _r1 = _two_ref_prefix()
    s = _BitWriter()
    s.ue(0)
    s.ue(5)
    s.ue(0)
    s.u(2, 8)
    s.u(0, 1)
    s.u(1, 1)      # modification flag
    s.ue(2)        # idc 2: long-term pic num
    s.rbsp_trailing()
    stream = prefix + _nal(1, 2, bytes(s.out))
    with pytest.raises(NotImplementedError, match="long-term"):
        list(decode_h264_annexb(stream, yuv=True))
