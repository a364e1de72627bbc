"""B-slice tier tests: spatial direct derivation, bi-prediction,
POC-ordered output, closed-loop encode/decode equality, macroblock
census behaviour, and the exact-or-refuse boundaries.

Mirrors the validation strategy of tests/test_h264_inter.py (the P
tier): decode == encoder reconstruction bit-for-bit through the same
MC path; scene-shaped censuses (static → B_Skip, translation →
motion-compensated types); hand-written streams for the refusal
paths the twin never emits.
"""

from __future__ import annotations

import numpy as np
import pytest

from finanalyzer_spark.operators.h264 import (
    _BitWriter,
    _nal,
    decode_h264_annexb,
    split_annexb,
)
from finanalyzer_spark.operators.h264_inter import (
    MvField,
    bi_average,
    encode_h264_video,
    spatial_direct,
)

YS, XS = np.mgrid[0:32, 0:48]
BASE = ((YS * 3 + XS * 5) % 256).astype(np.uint8)


def _frame(i: int, roll: int):
    return (
        np.roll(BASE, roll, axis=1)[:, :32].copy(),
        np.full((16, 16), (40 + i) % 256, np.uint8),
        np.full((16, 16), (90 - i) % 256, np.uint8),
    )


def _closed_loop(frames, **kw):
    recon: list = []
    stream = encode_h264_video(
        frames, yuv=True, recon_out=recon, **kw
    )
    counts: list = []
    decoded = list(decode_h264_annexb(stream, yuv=True, counts_out=counts))
    assert len(decoded) == len(frames) == len(recon)
    for (_fn, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)
    return stream, decoded, counts


@pytest.mark.parametrize("qp", [20, 26, 32])
def test_bgop_decode_equals_encoder_reconstruction(qp):
    frames = [_frame(i, i * 2) for i in range(6)]
    stream, _dec, counts = _closed_loop(
        frames, qp=qp, gop=6, search_range=2, b_frames=1
    )
    kinds = [c["kind"] for c in counts]
    assert kinds == ["I", "P", "B", "P", "B", "P"]
    # B NALs are non-reference (nal_ref_idc 0)
    idcs = [r for t, r, _ in split_annexb(stream) if t == 1]
    assert 0 in idcs and 2 in idcs


def test_two_b_frames_between_references():
    frames = [_frame(i, i) for i in range(7)]
    _stream, _dec, counts = _closed_loop(
        frames, qp=30, gop=7, search_range=2, b_frames=2
    )
    assert [c["kind"] for c in counts] == ["I", "P", "B", "B", "P", "B", "B"]


def test_static_scene_collapses_to_b_skip():
    frames = [_frame(0, 0) for _ in range(6)]
    stream, _dec, counts = _closed_loop(
        frames, qp=26, gop=6, search_range=2, b_frames=1
    )
    for c in counts:
        if c["kind"] == "B":
            assert c.get("bskip", 0) == 4, c  # every MB skipped
    # a static 2-MB B picture is a skip run: a handful of bytes
    assert len(stream) < 600


def test_display_order_reconstruction_tracks_sources():
    # distinct per-frame content: if POC reordering were wrong the
    # decoded sequence would mismatch the source sequence badly
    frames = [_frame(i, i * 4) for i in range(6)]
    _stream, decoded, _counts = _closed_loop(
        frames, qp=20, gop=6, search_range=4, b_frames=1
    )
    for i, (_fn, (y, _cb, _cr)) in enumerate(decoded):
        err = float(np.abs(y.astype(int) - frames[i][0].astype(int)).mean())
        assert err < 4.0, (i, err)
    assert [fn for fn, _ in decoded] == list(range(6))


def test_multiple_gops_with_b_frames():
    frames = [_frame(i, i * 2) for i in range(8)]
    _stream, _dec, counts = _closed_loop(
        frames, qp=26, gop=4, search_range=2, b_frames=1
    )
    assert [c["kind"] for c in counts] == [
        "I", "P", "B", "P", "I", "P", "B", "P",
    ]


def test_mixed_scene_uses_direct_and_varied_types():
    # left half static, right half translating: direct-mode MVs and
    # colZeroFlag vary across the picture, exercising per-block
    # spatial-direct prediction alongside searched B types
    frames = []
    for i in range(6):
        y = BASE[:, :32].copy()
        y[:, 16:] = np.roll(BASE, i * 3, axis=1)[:, 16:32]
        frames.append((
            y,
            np.full((16, 16), 60, np.uint8),
            np.full((16, 16), 70, np.uint8),
        ))
    _stream, _dec, counts = _closed_loop(
        frames, qp=28, gop=6, search_range=3, b_frames=1
    )
    btypes: dict = {}
    for c in counts:
        if c["kind"] == "B":
            for k, v in c.items():
                if k != "kind":
                    btypes[k] = btypes.get(k, 0) + v
    # the skip/direct family must carry the static half
    assert btypes.get("bskip", 0) + btypes.get("bdirect", 0) > 0, btypes


def test_bi_average_is_spec_rounding():
    a = np.array([[0, 1], [254, 255]], dtype=np.int64)
    b = np.array([[1, 2], [255, 255]], dtype=np.int64)
    assert np.array_equal(
        bi_average(a, b), np.array([[1, 2], [255, 255]], dtype=np.int64)
    )


def test_spatial_direct_zero_prediction_and_colzero():
    f0, f1 = MvField(2, 2), MvField(2, 2)
    col = {
        "state": np.full((8, 8), MvField.INTER, np.uint8),
        "mvx": np.zeros((8, 8), np.int64),
        "mvy": np.zeros((8, 8), np.int64),
    }
    # no neighbours decoded at all → directZeroPrediction: both lists,
    # zero MVs everywhere
    use0, use1, mv0, mv1 = spatial_direct(f0, f1, col, 0, 0, True)
    assert use0 and use1
    assert all(mv == (0, 0) for row in mv0 for mv in row)
    assert all(mv == (0, 0) for row in mv1 for mv in row)

    # left neighbour uses L0 with a large MV; colocated still (|mv|<=1)
    # → list 0 participates and every block zeroes via colZeroFlag
    f0b, f1b = MvField(2, 2), MvField(2, 2)
    f0b.put_inter(4, 0, 4, 4, (12, -8))   # MB (0,1)'s row: below? no —
    f1b.put_intra(4, 0, 4, 4)
    use0, use1, mv0, mv1 = spatial_direct(f0b, f1b, col, 1, 1, True)
    assert use0 and not use1
    assert all(mv == (0, 0) for row in mv0 for mv in row)

    # colocated MOVING (|mv|>1) → blocks keep the median predictor
    colm = {
        "state": np.full((8, 8), MvField.INTER, np.uint8),
        "mvx": np.full((8, 8), 8, np.int64),
        "mvy": np.zeros((8, 8), np.int64),
    }
    use0, use1, mv0, _mv1 = spatial_direct(f0b, f1b, colm, 1, 1, True)
    assert use0 and not use1
    assert all(mv == (12, -8) for row in mv0 for mv in row)


def _bstream_prefix(n_static: int = 3):
    """SPS/PPS/IDR/P prefix of a poc-type-0 B-capable stream, plus the
    (mbw, mbh) geometry — refusal tests append a doctored B NAL."""
    frames = [_frame(0, 0) for _ in range(n_static)]
    stream = encode_h264_video(
        frames, qp=26, gop=n_static, yuv=True, b_frames=1
    )
    nals = stream.split(b"\x00\x00\x00\x01")
    # keep SPS, PPS, IDR, first P (drop the trailing B NAL)
    kept = [n for n in nals if n][:4]
    return b"".join(b"\x00\x00\x00\x01" + n for n in kept)


def _b_header(direct: int = 1, idc: int = 1, poc: int = 2):
    s = _BitWriter()
    s.ue(0)        # first_mb_in_slice
    s.ue(6)        # slice_type: B
    s.ue(0)        # pps_id
    s.u(2, 8)      # frame_num
    s.u(poc, 8)    # pic_order_cnt_lsb (between the two references)
    s.u(direct, 1)  # direct_spatial_mv_pred_flag
    s.u(0, 1)      # num_ref_idx_active_override_flag
    s.u(0, 1)      # ref_pic_list_modification_flag_l0
    s.u(0, 1)      # ref_pic_list_modification_flag_l1
    s.se(0)        # slice_qp_delta
    s.ue(idc)      # disable_deblocking_filter_idc
    if idc != 1:
        s.se(0)    # slice_alpha_c0_offset_div2
        s.se(0)    # slice_beta_offset_div2
    return s


def test_temporal_direct_closed_loop():
    # temporal direct (8.4.1.2.3): POC-scaled colocated motion — the
    # twin emits direct_spatial_mv_pred_flag=0 and the decoder scales
    frames = [_frame(i, i * 2) for i in range(6)]
    recon: list = []
    stream = encode_h264_video(
        frames, qp=26, gop=6, yuv=True, search_range=2,
        recon_out=recon, b_frames=1, b_direct="temporal",
    )
    decoded = list(decode_h264_annexb(stream, yuv=True))
    for (_fn, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)
    with pytest.raises(ValueError, match="b_direct"):
        encode_h264_video(frames, yuv=True, b_frames=1, b_direct="x")


def test_temporal_direct_scaling_hand_computed():
    from finanalyzer_spark.operators.h264_inter import temporal_direct

    col = {
        "state": np.full((8, 8), MvField.INTER, np.uint8),
        "mvx": np.full((8, 8), 8, np.int64),
        "mvy": np.full((8, 8), -4, np.int64),
    }
    # mid-GOP B: tb=2, td=4 → tx=4096, DistScaleFactor=128 (half-way)
    use0, use1, mv0, mv1 = temporal_direct(col, (2, 0, 4), 0, 0, True)
    assert use0 and use1
    # mvL0 = (128*mvCol + 128) >> 8, arithmetic (floor) shift
    assert mv0[0][0] == (4, -2)
    # mvL1 = mvL0 - mvCol
    assert mv1[0][0] == (-4, 2)
    # intra colocated → zero motion both lists
    coli = {
        "state": np.full((8, 8), MvField.INTRA, np.uint8),
        "mvx": np.zeros((8, 8), np.int64),
        "mvy": np.zeros((8, 8), np.int64),
    }
    _u0, _u1, mv0, mv1 = temporal_direct(coli, (2, 0, 4), 0, 0, True)
    assert mv0[0][0] == (0, 0) and mv1[0][0] == (0, 0)
    # td == 0 degenerate branch: mvL0 = mvCol, mvL1 = 0
    _u0, _u1, mv0, mv1 = temporal_direct(col, (0, 0, 0), 0, 0, True)
    assert mv0[0][0] == (8, -4) and mv1[0][0] == (0, 0)


def test_deblocked_bgop_closed_loop():
    # §8.7 filtering inside B slices: two-list bS derivation
    # (reference sets compared first, then per-list MV deltas);
    # filtered references propagate through the GOP on both sides
    frames = [_frame(i, i * 2) for i in range(6)]
    for mode in ("spatial", "temporal"):
        recon: list = []
        stream = encode_h264_video(
            frames, qp=30, gop=6, yuv=True, search_range=2,
            recon_out=recon, b_frames=1, b_direct=mode, deblock=True,
        )
        decoded = list(decode_h264_annexb(stream, yuv=True))
        for (_fn, got), want in zip(decoded, recon):
            for g, x in zip(got, want):
                assert np.array_equal(g, x)


def test_reference_b_picture_refused():
    # B-pyramid: a B slice with nal_ref_idc != 0 would enter the DPB
    # with a list-0-only motion dict (missing 8.4.1.2 list-1 colocated
    # fallback) and bump output out of display order — the pure tier
    # refuses instead of decoding it wrong.  The twin only ever emits
    # non-reference B NALs, so rebuild its stream with the ref bits
    # flipped on the first B slice.
    frames = [_frame(i, i) for i in range(4)]
    stream = encode_h264_video(frames, qp=26, gop=4, yuv=True, b_frames=1)
    out = bytearray()
    flipped = False
    for t, ref, rbsp in split_annexb(stream):
        if t == 1 and ref == 0 and not flipped:
            out += _nal(1, 2, rbsp)
            flipped = True
        else:
            out += _nal(t, ref, rbsp)
    assert flipped
    with pytest.raises(NotImplementedError, match="B-pyramid"):
        list(decode_h264_annexb(bytes(out), yuv=True))


def test_b_without_future_reference_refused():
    # B whose POC lies AFTER every reference: no backward reference
    s = _BitWriter()
    s.ue(0)
    s.ue(6)
    s.ue(0)
    s.u(2, 8)
    s.u(200, 8)   # poc beyond both references
    s.rbsp_trailing()
    stream = _bstream_prefix() + _nal(1, 0, bytes(s.out))
    with pytest.raises(ValueError, match="both temporal references"):
        list(decode_h264_annexb(stream, yuv=True))


def test_b_stream_is_main_profile_with_poc0():
    from finanalyzer_spark.operators.h264 import parse_sps

    frames = [_frame(i, i) for i in range(4)]
    stream = encode_h264_video(frames, qp=26, gop=4, yuv=True, b_frames=1)
    for t, _r, rbsp in split_annexb(stream):
        if t == 7:
            sps = parse_sps(rbsp)
            assert sps["profile_idc"] == 77
            assert sps["poc_type"] == 0
            assert sps["num_ref_frames"] == 2
            break
    else:
        pytest.fail("no SPS")


def test_encoder_b_frames_validation():
    frames = [_frame(i, 0) for i in range(4)]
    with pytest.raises(ValueError, match="weighted prediction"):
        encode_h264_video(frames, yuv=True, b_frames=1, wp=(1, 3, 2))
    with pytest.raises(ValueError, match="gop"):
        encode_h264_video(frames, yuv=True, b_frames=1, gop=256)


def test_poc_type0_p_only_stream_still_decodes_in_order():
    # the reorder buffer must be a no-op for streams without B frames
    # even under POC type 0 (poc == decode order)
    frames = [_frame(i, i) for i in range(4)]
    recon: list = []
    stream = encode_h264_video(
        frames, qp=26, gop=2, yuv=True, recon_out=recon, b_frames=1
    )
    # gop=2 with b_frames=1 yields ref pairs only (no room for a B):
    counts: list = []
    decoded = list(decode_h264_annexb(stream, yuv=True, counts_out=counts))
    assert [c["kind"] for c in counts] == ["I", "P", "I", "P"]
    for (_fn, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)


def test_b_partition_shapes_handcrafted_stream_decodes():
    """Table 7-14/7-18 coverage: a hand-written B slice exercises a
    two-partition 16x8 with mixed lists (B_L0_L1_16x8), a bi-bi 8x16
    (B_Bi_Bi_8x16), a B_8x8 with direct / Bi_8x8 / Bi_8x4 / L1_4x4
    quadrants, and a trailing B_Skip — parse order per 7.3.5.1/2
    (all mvd_l0 pairs before all mvd_l1 pairs).  The decoded picture
    is verified against a test-side reconstruction assembled from the
    unit-tested MC / prediction / direct-mode primitives."""
    from finanalyzer_spark.operators.h264_inter import (
        mc_chroma,
        mc_luma,
        predict_mv_part,
    )

    # static 2-frame prefix: refs at POC 0 and 2; the P reference is
    # all P_Skip, so the colocated motion is inter with zero MVs
    frames = [_frame(0, 0), _frame(0, 0)]
    prefix = encode_h264_video(frames, qp=26, gop=2, yuv=True, b_frames=1)
    decoded_refs = list(decode_h264_annexb(prefix, yuv=True))
    ref0 = tuple(p.astype(np.int64) for p in decoded_refs[0][1])
    ref1 = tuple(p.astype(np.int64) for p in decoded_refs[1][1])
    col = {
        "state": np.full((8, 8), MvField.INTER, np.uint8),
        "mvx": np.zeros((8, 8), np.int64),
        "mvy": np.zeros((8, 8), np.int64),
    }

    s = _b_header(poc=1)
    # --- MB 0: B_L0_L1_16x8 (top L0, bottom L1) ---
    s.ue(0)   # mb_skip_run
    s.ue(8)   # mb_type
    mvd_mb0_l0, mvd_mb0_l1 = (6, -2), (-4, 2)
    for dx, dy in (mvd_mb0_l0, mvd_mb0_l1):
        s.se(dx)
        s.se(dy)
    s.ue(0)   # cbp 0
    # --- MB 1: B_Bi_Bi_8x16 ---
    s.ue(0)
    s.ue(21)
    mvd_mb1_l0 = [(2, 2), (0, -4)]
    mvd_mb1_l1 = [(-2, 0), (4, 4)]
    for dx, dy in mvd_mb1_l0 + mvd_mb1_l1:
        s.se(dx)
        s.se(dy)
    s.ue(0)
    # --- MB 2: B_8x8, quadrants direct / Bi_8x8 / Bi_8x4 / L1_4x4 ---
    s.ue(0)
    s.ue(22)
    for smt in (0, 3, 8, 11):
        s.ue(smt)
    mvd_mb2_l0 = [(4, 0), (0, 2), (-2, 2)]           # Bi8x8, Bi8x4 x2
    mvd_mb2_l1 = [(2, -2), (0, 4), (4, 2),           # Bi8x8, Bi8x4 x2
                  (1, 1), (-1, 1), (1, -1), (2, 0)]  # L1_4x4 x4
    for dx, dy in mvd_mb2_l0 + mvd_mb2_l1:
        s.se(dx)
        s.se(dy)
    s.ue(0)
    # --- MB 3: trailing B_Skip run ---
    s.ue(1)
    s.rbsp_trailing()
    stream = _bstream_prefix(2) + _nal(1, 0, bytes(s.out))

    counts: list = []
    decoded = list(decode_h264_annexb(stream, yuv=True,
                                      counts_out=counts))
    assert [c["kind"] for c in counts] == ["I", "P", "B"]
    bcounts = counts[-1]
    assert bcounts.get("bpart") == 2
    assert bcounts.get("b8x8") == 1
    assert bcounts.get("bskip") == 1
    got_y, got_cb, got_cr = decoded[1][1]  # POC 1 sits between the refs

    # ---- test-side expected reconstruction ----
    f0, f1 = MvField(2, 2), MvField(2, 2)
    exp_y = np.zeros((32, 32), np.int64)
    exp_cb = np.zeros((16, 16), np.int64)
    exp_cr = np.zeros((16, 16), np.int64)

    def paint(gx, gy, w4, h4, mv0, mv1):
        bw, bh = w4 * 4, h4 * 4
        px, py = gx * 4, gy * 4
        parts = []
        for mv, ref in ((mv0, ref0), (mv1, ref1)):
            if mv is None:
                continue
            parts.append((
                mc_luma(ref[0], px, py, mv[0], mv[1], bh=bh, bw=bw),
                mc_chroma(ref[1], px // 2, py // 2, mv[0], mv[1],
                          bh=bh // 2, bw=bw // 2),
                mc_chroma(ref[2], px // 2, py // 2, mv[0], mv[1],
                          bh=bh // 2, bw=bw // 2),
            ))
        blk = (
            tuple(bi_average(a, b) for a, b in zip(parts[0], parts[1]))
            if len(parts) == 2 else parts[0]
        )
        exp_y[py : py + bh, px : px + bw] = np.clip(blk[0], 0, 255)
        exp_cb[py // 2 : py // 2 + bh // 2,
               px // 2 : px // 2 + bw // 2] = np.clip(blk[1], 0, 255)
        exp_cr[py // 2 : py // 2 + bh // 2,
               px // 2 : px // 2 + bw // 2] = np.clip(blk[2], 0, 255)

    def commit(gx, gy, w4, h4, mv0, mv1):
        if mv0 is not None:
            f0.put_inter(gy, gx, h4, w4, mv0)
        else:
            f0.put_intra(gy, gx, h4, w4)
        if mv1 is not None:
            f1.put_inter(gy, gx, h4, w4, mv1)
        else:
            f1.put_intra(gy, gx, h4, w4)

    # MB 0 at (0,0): 16x8, top L0 (directional B), bottom L1 (A)
    mvp = predict_mv_part(f0, 0, 0, 4, "B")
    mv = (mvp[0] + mvd_mb0_l0[0], mvp[1] + mvd_mb0_l0[1])
    commit(0, 0, 4, 2, mv, None)
    paint(0, 0, 4, 2, mv, None)
    mvp = predict_mv_part(f1, 0, 2, 4, "A")
    mv = (mvp[0] + mvd_mb0_l1[0], mvp[1] + mvd_mb0_l1[1])
    commit(0, 2, 4, 2, None, mv)
    paint(0, 2, 4, 2, None, mv)
    # MB 1 at (1,0): 8x16 bi/bi — left ("A") then right ("C")
    for pi, (gx, dirn) in enumerate(((4, "A"), (6, "C"))):
        mvp0 = predict_mv_part(f0, gx, 0, 2, dirn)
        mv0 = (mvp0[0] + mvd_mb1_l0[pi][0], mvp0[1] + mvd_mb1_l0[pi][1])
        mvp1 = predict_mv_part(f1, gx, 0, 2, dirn)
        mv1 = (mvp1[0] + mvd_mb1_l1[pi][0], mvp1[1] + mvd_mb1_l1[pi][1])
        commit(gx, 0, 2, 4, mv0, mv1)
        paint(gx, 0, 2, 4, mv0, mv1)
    # MB 2 at (0,1): B_8x8 — direct / Bi_8x8 / Bi_8x4 x2 / L1_4x4 x4
    use0, use1, dmv0, dmv1 = spatial_direct(f0, f1, col, 0, 1, True)
    for by in range(2):
        for bx in range(2):
            mv0 = dmv0[by][bx] if use0 else None
            mv1 = dmv1[by][bx] if use1 else None
            commit(bx, 4 + by, 1, 1, mv0, mv1)
            paint(bx, 4 + by, 1, 1, mv0, mv1)
    k0 = k1 = 0
    # quadrant 1 (top-right): Bi_8x8
    mvp0 = predict_mv_part(f0, 2, 4, 2)
    mv0 = (mvp0[0] + mvd_mb2_l0[k0][0], mvp0[1] + mvd_mb2_l0[k0][1])
    k0 += 1
    mvp1 = predict_mv_part(f1, 2, 4, 2)
    mv1 = (mvp1[0] + mvd_mb2_l1[k1][0], mvp1[1] + mvd_mb2_l1[k1][1])
    k1 += 1
    commit(2, 4, 2, 2, mv0, mv1)
    paint(2, 4, 2, 2, mv0, mv1)
    # quadrant 2 (bottom-left): Bi_8x4 — two 8x4 sub-partitions
    for gy in (6, 7):
        mvp0 = predict_mv_part(f0, 0, gy, 2)
        mv0 = (mvp0[0] + mvd_mb2_l0[k0][0], mvp0[1] + mvd_mb2_l0[k0][1])
        k0 += 1
        mvp1 = predict_mv_part(f1, 0, gy, 2)
        mv1 = (mvp1[0] + mvd_mb2_l1[k1][0], mvp1[1] + mvd_mb2_l1[k1][1])
        k1 += 1
        commit(0, gy, 2, 1, mv0, mv1)
        paint(0, gy, 2, 1, mv0, mv1)
    # quadrant 3 (bottom-right): L1_4x4 — four 4x4 sub-partitions
    for gy in (6, 7):
        for gx in (2, 3):
            mvp1 = predict_mv_part(f1, gx, gy, 1)
            mv1 = (mvp1[0] + mvd_mb2_l1[k1][0],
                   mvp1[1] + mvd_mb2_l1[k1][1])
            k1 += 1
            commit(gx, gy, 1, 1, None, mv1)
            paint(gx, gy, 1, 1, None, mv1)
    assert k0 == len(mvd_mb2_l0) and k1 == len(mvd_mb2_l1)
    # MB 3 at (1,1): B_Skip — spatial direct over the evolved fields
    use0, use1, dmv0, dmv1 = spatial_direct(f0, f1, col, 1, 1, True)
    for by in range(4):
        for bx in range(4):
            mv0 = dmv0[by][bx] if use0 else None
            mv1 = dmv1[by][bx] if use1 else None
            paint(4 + bx, 4 + by, 1, 1, mv0, mv1)

    assert np.array_equal(got_y, exp_y.astype(np.uint8))
    assert np.array_equal(got_cb, exp_cb.astype(np.uint8))
    assert np.array_equal(got_cr, exp_cr.astype(np.uint8))


def test_b_invalid_sub_mb_type_rejected():
    s = _b_header(poc=1)
    s.ue(0)
    s.ue(22)
    for _ in range(4):
        s.ue(13)  # out of Table 7-18 range
    s.rbsp_trailing()
    stream = _bstream_prefix(2) + _nal(1, 0, bytes(s.out))
    with pytest.raises(ValueError, match="sub_mb_type"):
        list(decode_h264_annexb(stream, yuv=True))
