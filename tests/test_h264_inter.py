"""Inter-prediction tier tests (operators/h264_inter.py).

Defences mirror the CAVLC intra suite: the motion-compensation core
is cross-checked against an INDEPENDENT per-pixel implementation of
spec 8.4.2.2 written in this file (different formulation — scalar
taps per coordinate vs the module's vectorised padded-window), the
half-pel filter is pinned on hand-computed vectors, and the GOP twin
is pinned decode == encoder-reconstruction bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest

from finanalyzer_spark.operators.h264 import (
    _BitReader,
    decode_h264_annexb,
    parse_pps,
    parse_sps,
    split_annexb,
)
from finanalyzer_spark.operators.h264_cavlc import (
    decode_slice,
    encode_h264_intra,
)
from finanalyzer_spark.operators.h264_inter import (
    CBP_INTER_FROM_CODENUM,
    encode_h264_video,
    mc_chroma,
    mc_luma,
    predict_mv,
    skip_mv,
)


# ---------------------------------------------------------------------------
# independent per-pixel reference implementation of 8.4.2.2
# ---------------------------------------------------------------------------
def _p(ref, y, x):
    h, w = ref.shape
    return int(ref[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])


def _brute_luma(ref, px, py, mvx, mvy, bh, bw):
    def b1(y, x):
        return (
            _p(ref, y, x - 2) - 5 * _p(ref, y, x - 1) + 20 * _p(ref, y, x)
            + 20 * _p(ref, y, x + 1) - 5 * _p(ref, y, x + 2)
            + _p(ref, y, x + 3)
        )

    def bb(y, x):
        return min(max((b1(y, x) + 16) >> 5, 0), 255)

    def hh(y, x):
        t = (
            _p(ref, y - 2, x) - 5 * _p(ref, y - 1, x) + 20 * _p(ref, y, x)
            + 20 * _p(ref, y + 1, x) - 5 * _p(ref, y + 2, x)
            + _p(ref, y + 3, x)
        )
        return min(max((t + 16) >> 5, 0), 255)

    def jj(y, x):
        t = (
            b1(y - 2, x) - 5 * b1(y - 1, x) + 20 * b1(y, x)
            + 20 * b1(y + 1, x) - 5 * b1(y + 2, x) + b1(y + 3, x)
        )
        return min(max((t + 512) >> 10, 0), 255)

    out = np.zeros((bh, bw), np.int64)
    ix, iy, fx, fy = mvx >> 2, mvy >> 2, mvx & 3, mvy & 3
    for r in range(bh):
        for c in range(bw):
            x, y = px + c + ix, py + r + iy
            g = _p(ref, y, x)
            hr = _p(ref, y, x + 1)
            m_ = _p(ref, y + 1, x)
            b = bb(y, x)
            h_ = hh(y, x)
            j = jj(y, x)
            mm = hh(y, x + 1)
            ss = bb(y + 1, x)
            out[r, c] = {
                (0, 0): g, (1, 0): (g + b + 1) >> 1, (2, 0): b,
                (3, 0): (b + hr + 1) >> 1,
                (0, 1): (g + h_ + 1) >> 1, (1, 1): (b + h_ + 1) >> 1,
                (2, 1): (b + j + 1) >> 1, (3, 1): (b + mm + 1) >> 1,
                (0, 2): h_, (1, 2): (h_ + j + 1) >> 1, (2, 2): j,
                (3, 2): (j + mm + 1) >> 1,
                (0, 3): (m_ + h_ + 1) >> 1, (1, 3): (h_ + ss + 1) >> 1,
                (2, 3): (j + ss + 1) >> 1, (3, 3): (mm + ss + 1) >> 1,
            }[(fx, fy)]
    return out


def test_mc_luma_matches_independent_reference():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (40, 56)).astype(np.int64)
    # cover all 16 quarter-pel classes plus random integer parts,
    # including out-of-bounds MVs that exercise the edge clamp
    fracs = [(fx, fy) for fx in range(4) for fy in range(4)]
    for i, (fx, fy) in enumerate(fracs * 4):
        px, py = int(rng.integers(0, 40)), int(rng.integers(0, 24))
        mvx = int(rng.integers(-10, 10)) * 4 + fx
        mvy = int(rng.integers(-10, 10)) * 4 + fy
        got = mc_luma(ref, px, py, mvx, mvy, 8, 8)
        want = _brute_luma(ref, px, py, mvx, mvy, 8, 8)
        assert np.array_equal(got, want), (px, py, mvx, mvy)


def test_mc_chroma_matches_independent_reference():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (20, 28)).astype(np.int64)
    for _ in range(64):
        px, py = int(rng.integers(0, 20)), int(rng.integers(0, 12))
        mvx, mvy = int(rng.integers(-60, 60)), int(rng.integers(-60, 60))
        got = mc_chroma(ref, px, py, mvx, mvy, 4, 4)
        ix, iy, dx, dy = mvx >> 3, mvy >> 3, mvx & 7, mvy & 7
        want = np.zeros((4, 4), np.int64)
        for r in range(4):
            for c in range(4):
                x, y = px + c + ix, py + r + iy
                want[r, c] = (
                    (8 - dx) * (8 - dy) * _p(ref, y, x)
                    + dx * (8 - dy) * _p(ref, y, x + 1)
                    + (8 - dx) * dy * _p(ref, y + 1, x)
                    + dx * dy * _p(ref, y + 1, x + 1)
                    + 32
                ) >> 6
        assert np.array_equal(got, want)


def test_half_pel_filter_hand_computed():
    # one row, interpolate between the middle pair: samples
    # 10 20 30 40 50 60 → 10 - 100 + 600 + 800 - 250 + 60 = 1120,
    # (1120 + 16) >> 5 = 35
    ref = np.array([[10, 20, 30, 40, 50, 60]] * 6, np.int64)
    got = mc_luma(ref, 2, 0, 2, 0, 1, 1)  # half-pel between cols 2,3
    assert got[0, 0] == 35
    # saturating case: step edge 0 0 255 255 0 0 → 20*255 + 20*255
    # - 0 ... = 10200 → (10200+16)>>5 = 319 → clipped 255
    ref2 = np.array([[0, 0, 255, 255, 0, 0]] * 6, np.int64)
    assert mc_luma(ref2, 2, 0, 2, 0, 1, 1)[0, 0] == 255


def test_cbp_inter_table_is_permutation_with_known_anchors():
    assert sorted(CBP_INTER_FROM_CODENUM) == list(range(48))
    # widely-documented anchors of the Inter column of Table 9-4
    assert CBP_INTER_FROM_CODENUM[0] == 0   # cheapest: no residual
    assert CBP_INTER_FROM_CODENUM[1] == 16  # next: chroma DC only
    assert CBP_INTER_FROM_CODENUM[2] == 1   # then single luma 8x8


def _field(mbw, mbh, mb_rows):
    """Build an MvField from MB-granularity rows: tuple = inter MV,
    'i' = decoded intra, None = not yet decoded."""
    from finanalyzer_spark.operators.h264_inter import MvField

    f = MvField(mbw, mbh)
    for my, row in enumerate(mb_rows):
        for mx, v in enumerate(row):
            if v == "i":
                f.put_intra(my * 4, mx * 4, 4, 4)
            elif v is not None:
                f.put_inter(my * 4, mx * 4, 4, 4, v)
    return f


def test_mv_prediction_rules():
    # nothing decoded → zero
    f = _field(3, 2, [[None] * 3, [None] * 3])
    assert predict_mv(f, 0, 0) == (0, 0)
    # top row with left inter neighbour → A (8.4.1.3.2 special case)
    f = _field(3, 2, [[(12, -4), None, None], [None] * 3])
    assert predict_mv(f, 1, 0) == (12, -4)
    # exactly one inter neighbour among A/B/C → that one
    f = _field(3, 2, [["i", (8, 2), "i"], ["i", None, None]])
    assert predict_mv(f, 1, 1) == (8, 2)
    # three inter neighbours → component-wise median
    f3 = _field(3, 2, [[(0, 0), (4, 8), (16, -4)], [(8, 2), None, None]])
    assert predict_mv(f3, 1, 1) == (8, 2)  # med(8,4,16), med(2,8,-4)
    # skip: zero when left/above missing or zero-MV
    assert skip_mv(f3, 0, 1) == (0, 0)  # left edge
    # above neighbour has a zero MV → skip MV forced to zero
    f = _field(2, 2, [["i", (0, 0)], [(4, 4), None]])
    assert skip_mv(f, 1, 1) == (0, 0)
    f = _field(2, 2, [[(4, 4), (4, 4)], [(4, 4), None]])
    assert skip_mv(f, 1, 1) == (4, 4)


def test_mv_prediction_partition_rules():
    """8.4.1.3 directional rules for the two-partition shapes, at 4x4
    block granularity, including partition 1 seeing partition 0's MV
    through the override."""
    from finanalyzer_spark.operators.h264_inter import predict_mv_part

    # current MB at (1,1) of a 3x2 grid; neighbours all inter
    f = _field(3, 2, [[(0, 0), (4, 8), (16, -4)], [(8, 2), None, None]])
    gx, gy = 4, 4
    # 16x8 top partition → B (above MB) directly
    assert predict_mv_part(f, gx, gy, 4, "B") == (4, 8)
    # 8x16 left partition → A (left MB) directly
    assert predict_mv_part(f, gx, gy, 2, "A") == (8, 2)
    # 8x16 right partition → C (above-right MB)
    assert predict_mv_part(f, gx + 2, gy, 2, "C") == (16, -4)
    # 16x8 bottom partition → A, reading partition 0 via override is
    # NOT involved (A is the left MB's lower half)
    assert predict_mv_part(f, gx, gy + 2, 4, "A") == (8, 2)
    # directional neighbour intra → falls back to the median process
    fi = _field(3, 2, [[(0, 0), "i", (16, -4)], [(8, 2), None, None]])
    assert predict_mv_part(fi, gx, gy, 4, "B") == predict_mv_part(
        fi, gx, gy, 4, None
    )
    # override: partition 1 of an 8x16 whose C is unavailable (D
    # substituted from the left MB's top-right block); partition 0's
    # committed MV flows through the override as neighbour A
    f2 = _field(2, 1, [[(8, 2), None]])
    ov = {(xx, yy): (40, 0) for xx in (4, 5) for yy in range(4)}
    got = predict_mv_part(f2, 6, 0, 2, "C", override=ov)
    # C=(8,-1) out of range → D=(5,-1) out of range → median path:
    # A=(40,0) from override, B/C unavailable → rule → A
    assert got == (40, 0)


# ---------------------------------------------------------------------------
# GOP twin exactness
# ---------------------------------------------------------------------------
def _translating(n, seed=5, h=48, w=64):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 16, w + 32)).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.roll(np.roll(base, i * 2, axis=1), i, axis=0)[:h, :w]
        cb = np.full((h // 2, w // 2), 100 + i, np.uint8)
        cr = np.full((h // 2, w // 2), 150 - i, np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("qp", [10, 30, 47])
def test_gop_decode_equals_encoder_reconstruction(qp):
    frames = _translating(6, seed=qp)
    recon: list = []
    stream = encode_h264_video(
        frames, qp=qp, gop=3, yuv=True, recon_out=recon
    )
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == 6 == len(recon)
    for (fno, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x), (qp, fno)


def test_translating_scene_codes_much_smaller_than_intra():
    frames = _translating(8)
    p_stream = encode_h264_video(frames, qp=26, gop=8, yuv=True)
    i_stream = encode_h264_intra(frames, qp=26, yuv=True)
    assert len(p_stream) < len(i_stream) * 0.6, (
        len(p_stream), len(i_stream),
    )


def test_static_scene_collapses_to_skip_runs():
    frames = [_translating(1)[0]] * 5
    stream = encode_h264_video(frames, qp=26, gop=8, yuv=True)
    nals = [n for n in stream.split(b"\x00\x00\x00\x01") if n]
    # SPS, PPS, IDR, then four P NALs; once the reference converges a
    # P picture is a single mb_skip_run — a handful of bytes
    assert len(nals) == 7
    assert len(nals[-1]) < 12, len(nals[-1])
    # and the macroblock census of the last P frame is all-skip
    counts = _mb_census(stream)
    assert counts[-1].get("pskip", 0) == counts[-1].get("total")


def test_scene_cut_uses_intra_fallback_in_p_frame():
    rng = np.random.default_rng(77)
    a = _translating(2, seed=1)
    cut = (
        rng.integers(0, 256, (48, 64)).astype(np.uint8),
        rng.integers(0, 256, (24, 32)).astype(np.uint8),
        rng.integers(0, 256, (24, 32)).astype(np.uint8),
    )
    frames = [a[0], a[1], cut]
    recon: list = []
    stream = encode_h264_video(
        frames, qp=30, gop=8, yuv=True, recon_out=recon
    )
    counts = _mb_census(stream)
    # the post-cut P frame must contain intra macroblocks
    intra_mbs = counts[-1].get("i4", 0) + counts[-1].get("i16", 0)
    assert intra_mbs > 0, counts[-1]
    decoded = list(decode_h264_annexb(stream, yuv=True))
    for (fno, got), want in zip(decoded, recon):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)


def _mb_census(stream):
    """Instrumented re-walk: per-picture macroblock kind counts."""
    sps = pps = None
    ref = None
    out = []
    for nal_type, _ref_idc, rbsp in split_annexb(stream):
        if nal_type == 7:
            sps = parse_sps(rbsp)
        elif nal_type == 8:
            pps = parse_pps(rbsp)
        elif nal_type in (1, 5):
            r = _BitReader(rbsp)
            r.ue()
            slice_type = r.ue()
            kind = "I" if slice_type % 5 == 2 else "P"
            r.ue()
            r.u(sps["log2_max_frame_num"])
            if nal_type == 5:
                r.ue()
            if kind == "P":
                r.u(1)
                r.u(1)
            r.u(1)
            r.u(1) if nal_type == 5 else None
            qp = pps["pic_init_qp"] + r.se()
            assert r.ue() == 1
            counts: dict = {}
            planes = decode_slice(
                r, sps, pps, qp, True, kind, ref, counts=counts
            )
            np_mod = np
            ref = tuple(p.astype(np_mod.int64) for p in planes)
            counts["total"] = (
                sps["pic_width_in_mbs"] * sps["pic_height_in_map_units"]
            )
            out.append(counts)
    return out


def test_gop_rgb_path():
    # structured content: 4:2:0 subsampling of RGB noise would add
    # large irreducible chroma error unrelated to the codec
    ys, xs = np.mgrid[0:48, 0:80]
    base = np.stack(
        [
            (ys * 4 + xs) % 256,
            (ys + xs * 5) % 256,
            np.full_like(ys, 90),
        ],
        axis=2,
    ).astype(np.uint8)
    frames = [np.roll(base, i * 3, axis=1)[:, :64] for i in range(4)]
    stream = encode_h264_video(frames, qp=22, gop=4)
    decoded = list(decode_h264_annexb(stream))
    assert len(decoded) == 4
    for i, (fno, rgb) in enumerate(decoded):
        assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
        err = np.abs(
            rgb.astype(int) - frames[i].astype(int)
        ).mean()
        assert err < 12.0, (i, err)


# ---------------------------------------------------------------------------
# refusal paths
# ---------------------------------------------------------------------------
def test_p_slice_before_reference_refused():
    frames = _translating(3)
    stream = encode_h264_video(frames, qp=30, gop=3, yuv=True)
    sc = b"\x00\x00\x00\x01"
    nals = [sc + n for n in stream.split(sc) if n]
    # drop the IDR (index 2), keep SPS/PPS + a P NAL
    broken = b"".join(nals[:2] + nals[3:4])
    with pytest.raises(ValueError, match="reference"):
        list(decode_h264_annexb(broken, yuv=True))


def test_p8x8_handcrafted_stream_decodes():
    """Round 7: P_8x8 decodes natively.  One hand-written macroblock
    exercises ALL FOUR sub_mb_type shapes (8x8, 8x4, 4x8, 4x4) with
    the spec parse order (four sub types first, then mvd pairs in
    sub-partition raster order, 7.3.5.2) and per-sub-partition median
    prediction; the decoded picture is verified against a test-side
    reconstruction assembled from the unit-tested MC / prediction
    primitives, and the rest of the picture rides a trailing
    P_Skip run over the evolving MV field."""
    from finanalyzer_spark.operators.h264 import _BitWriter
    from finanalyzer_spark.operators.h264_inter import (
        MvField,
        mc_chroma,
        mc_luma,
        predict_mv_part,
        skip_mv,
    )

    frames = _translating(2)
    stream = encode_h264_video(frames, qp=30, gop=2, yuv=True)
    sps = pps = None
    ref = None
    for nal_type, _r, rbsp in split_annexb(stream):
        if nal_type == 7:
            sps = parse_sps(rbsp)
        elif nal_type == 8:
            pps = parse_pps(rbsp)
        elif nal_type == 5:
            r = _BitReader(rbsp)
            for _ in range(3):
                r.ue()
            r.u(8)
            r.ue()
            r.u(1)
            r.u(1)
            qp = pps["pic_init_qp"] + r.se()
            assert r.ue() == 1
            planes = decode_slice(r, sps, pps, qp, True, "I", None)
            ref = tuple(p.astype(np.int64) for p in planes)
    mbw = sps["pic_width_in_mbs"]
    mbh = sps["pic_height_in_map_units"]
    subs = [0, 1, 2, 3]  # 8x8, 8x4, 4x8, 4x4 — one of each
    mvds = [(4, 0), (0, 4), (-4, 0), (2, 2), (6, -2), (0, 0),
            (4, 4), (-2, 6), (8, 0)]  # 1 + 2 + 2 + 4 sub-partitions
    s = _BitWriter()
    s.ue(0)  # mb_skip_run
    s.ue(3)  # mb_type P_8x8
    for smt in subs:
        s.ue(smt)
    for dx, dy in mvds:
        s.se(dx)
        s.se(dy)
    s.ue(0)  # coded_block_pattern 0 (codeNum 0 → cbp 0)
    s.ue(mbw * mbh - 1)  # trailing skip run
    s.rbsp_trailing()
    got = decode_slice(
        _BitReader(bytes(s.out)), sps, pps, 30, True, "P", ref
    )
    # --- test-side expected reconstruction
    shapes = {0: (2, 2), 1: (2, 1), 2: (1, 2), 3: (1, 1)}
    f = MvField(mbw, mbh)
    exp_y = np.zeros((mbh * 16, mbw * 16), np.int64)
    exp_cb = np.zeros((mbh * 8, mbw * 8), np.int64)
    exp_cr = np.zeros((mbh * 8, mbw * 8), np.int64)

    def paint(gx, gy, w4, h4, mv):
        bw, bh = w4 * 4, h4 * 4
        px, py = gx * 4, gy * 4
        exp_y[py : py + bh, px : px + bw] = np.clip(
            mc_luma(ref[0], px, py, mv[0], mv[1], bh=bh, bw=bw), 0, 255
        )
        for plane, rc in ((exp_cb, ref[1]), (exp_cr, ref[2])):
            plane[
                py // 2 : py // 2 + bh // 2, px // 2 : px // 2 + bw // 2
            ] = np.clip(
                mc_chroma(rc, px // 2, py // 2, mv[0], mv[1],
                          bh=bh // 2, bw=bw // 2), 0, 255
            )

    k = 0
    for part in range(4):
        qx, qy = (part & 1) * 2, (part >> 1) * 2
        w4, h4 = shapes[subs[part]]
        for sy in range(0, 2, h4):
            for sx in range(0, 2, w4):
                gx, gy = qx + sx, qy + sy
                mvp = predict_mv_part(f, gx, gy, w4)
                mv = (mvp[0] + mvds[k][0], mvp[1] + mvds[k][1])
                k += 1
                f.put_inter(gy, gx, h4, w4, mv)
                paint(gx, gy, w4, h4, mv)
    assert k == len(mvds)
    for mb in range(1, mbw * mbh):
        my, mx = divmod(mb, mbw)
        mv = skip_mv(f, mx, my)
        f.put_inter(my * 4, mx * 4, 4, 4, mv)
        paint(mx * 4, my * 4, 4, 4, mv)
    assert np.array_equal(got[0], exp_y.astype(np.uint8))
    assert np.array_equal(got[1], exp_cb.astype(np.uint8))
    assert np.array_equal(got[2], exp_cr.astype(np.uint8))


def test_encoder_input_validation():
    frames = _translating(2)
    with pytest.raises(ValueError, match="gop"):
        encode_h264_video(frames, gop=1, yuv=True)
    with pytest.raises(ValueError, match="qp"):
        encode_h264_video(frames, qp=99, yuv=True)


# ---------------------------------------------------------------------------
# container bridge
# ---------------------------------------------------------------------------
def test_mp4_video_bridge_keyframe_index_and_decode():
    from finanalyzer_spark.operators.mp4 import (
        demux_mp4,
        mp4_avc_to_annexb,
        mux_mp4_avc,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 80, 3)).astype(np.uint8)
    frames = [np.roll(base, i * 2, axis=1)[:, :64] for i in range(6)]
    mp4 = mux_mp4_avc(frames, codec="video", qp=26)
    samples = list(demux_mp4(mp4))
    assert len(samples) == 6
    # gop default 8 → one IDR at sample 0; only it is a sync sample
    assert [s[3] for s in samples] == [True] + [False] * 5
    via_mp4 = [
        f for _no, f in decode_h264_annexb(mp4_avc_to_annexb(mp4))
    ]
    from finanalyzer_spark.operators.h264_inter import (
        encode_h264_video as ev,
    )

    direct = [f for _no, f in decode_h264_annexb(ev(frames, qp=26))]
    assert len(via_mp4) == 6
    for a, b in zip(via_mp4, direct):
        assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# round-7 review regressions: conformant-input refusals and reference
# management (exact-or-refuse holes found by code review)
# ---------------------------------------------------------------------------
from finanalyzer_spark.operators.h264 import (  # noqa: E402
    NAL_IDR,
    NAL_PPS,
    NAL_SLICE,
    NAL_SPS,
    _BitWriter,
    _nal,
    write_sps_pps,
)


def _sc_nals(stream):
    sc = b"\x00\x00\x00\x01"
    return [sc + n for n in stream.split(sc) if n]


def test_multi_ref_claim_beyond_dpb_fails_closed():
    """A stream whose PPS sets num_ref_idx_l0_default_active_minus1
    >= 1 while the DPB holds a single decoded reference is invalid —
    multi-ref P decodes natively now, but an active-reference count
    the DPB cannot satisfy must fail closed, not misparse."""
    frames = _translating(2)
    stream = encode_h264_video(frames, qp=30, gop=2, yuv=True)
    _sps_rbsp, pps2 = write_sps_pps(
        4, 3, pic_init_qp=30, deblocking_control=True,
        num_ref_l0_default=2,
    )
    nals = _sc_nals(stream)
    patched = b"".join(
        [nals[0], _nal(NAL_PPS, 3, pps2)] + nals[2:]
    )
    with pytest.raises(ValueError, match="exceeds the decoded"):
        list(decode_h264_annexb(patched, yuv=True))


def test_non_reference_picture_not_stored_as_reference():
    """Spec 8.2.5: only reference pictures (nal_ref_idc != 0) enter
    the DPB.  Stream: IDR, then a DISPOSABLE P1 (nal_ref_idc=0,
    shifted MC), then a P2 that is all P_Skip with a zero skip MV —
    P2 must reproduce the IDR, not P1."""
    rng = np.random.default_rng(13)
    y = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cb = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    cr = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    idr_stream = encode_h264_intra([(y, cb, cr)], qp=20, yuv=True)
    nals = _sc_nals(idr_stream)

    def p_slice(ref_idc, body_fn):
        s = _BitWriter()
        s.ue(0)   # first_mb_in_slice
        s.ue(5)   # slice_type P
        s.ue(0)   # pps_id
        s.u(1, 8)  # frame_num
        s.u(0, 1)  # num_ref_idx_active_override
        s.u(0, 1)  # ref_pic_list_modification_l0
        if ref_idc:  # dec_ref_pic_marking only for reference slices
            s.u(0, 1)
        s.se(0)   # slice_qp_delta
        s.ue(1)   # disable_deblocking_filter_idc
        body_fn(s)
        s.rbsp_trailing()
        return _nal(NAL_SLICE, ref_idc, bytes(s.out))

    def moving_body(s):
        s.ue(0)   # skip_run
        s.ue(0)   # P_L0_16x16, MB0
        s.se(8)
        s.se(0)   # mv = (8, 0)
        s.ue(0)   # CBP 0
        s.ue(1)   # trailing skip run covers MB1 (skip mv = pred = A)

    def all_skip_body(s):
        s.ue(2)   # both MBs skipped; MB0 skip MV = (0,0) (edge rule)

    stream = b"".join(
        nals
        + [p_slice(0, moving_body), p_slice(2, all_skip_body)]
    )
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == 3
    f0, f1, f2 = (d[1] for d in decoded)
    # the disposable P1 really is shifted (differs from the IDR)
    assert not np.array_equal(f1[0], f0[0])
    # and P2, predicting with zero MVs, must equal the IDR — P1 was
    # never stored as a reference
    for a, b in zip(f2, f0):
        assert np.array_equal(a, b)


def test_interlaced_stream_refused():
    """frame_mbs_only=0 puts field_pic_flag in the slice header —
    the pure tier must refuse instead of misparsing (7.3.3)."""
    sps = _BitWriter()
    sps.u(66, 8)
    sps.u(0xC0, 8)
    sps.u(30, 8)
    sps.ue(0)
    sps.ue(4)
    sps.ue(2)
    sps.ue(1)
    sps.u(0, 1)
    sps.ue(1)   # pic_width_in_mbs_minus1
    sps.ue(0)   # pic_height_in_map_units_minus1
    sps.u(0, 1)  # frame_mbs_only = 0 (interlaced)
    sps.u(0, 1)  # mb_adaptive_frame_field
    sps.u(1, 1)  # direct_8x8_inference
    sps.u(0, 1)  # frame_cropping
    sps.u(0, 1)  # vui
    sps.rbsp_trailing()
    _sps_d, pps_rbsp = write_sps_pps(2, 1, deblocking_control=True)
    s = _BitWriter()
    s.ue(0)
    s.ue(7)
    s.ue(0)
    s.rbsp_trailing()  # header would misparse from here on
    stream = (
        _nal(NAL_SPS, 3, bytes(sps.out))
        + _nal(NAL_PPS, 3, pps_rbsp)
        + _nal(NAL_IDR, 3, bytes(s.out))
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        list(decode_h264_annexb(stream, yuv=True))


def test_constrained_intra_pred_p_refused_i_allowed():
    """CIP=1 changes intra prediction inside P slices (inter
    neighbours become unavailable, 8.3.1.2) — refuse P, but CIP has
    no effect on all-intra pictures, which must still decode."""
    frames = _translating(2, h=16, w=32)
    stream = encode_h264_video(frames, qp=30, gop=2, yuv=True)
    _s2, pps_cip = write_sps_pps(
        2, 1, pic_init_qp=30, deblocking_control=True,
        constrained_intra_pred=True,
    )
    nals = _sc_nals(stream)
    patched = b"".join([nals[0], _nal(NAL_PPS, 3, pps_cip)] + nals[2:])
    with pytest.raises(NotImplementedError, match="constrained_intra"):
        list(decode_h264_annexb(patched, yuv=True))
    # I-only stream with the same CIP PPS decodes fine
    intra = encode_h264_intra([frames[0]], qp=30, yuv=True)
    inals = _sc_nals(intra)
    ipatched = b"".join(
        [inals[0], _nal(NAL_PPS, 3, pps_cip)] + inals[2:]
    )
    assert len(list(decode_h264_annexb(ipatched, yuv=True))) == 1


def test_avc1_mid_stream_refusal_no_partial_frames():
    """An MP4 whose avc1 track starts decodable but hits a
    multi-reference P frame mid-stream must NOT emit a partial
    pure-tier sequence before falling to PyAV (which is absent here →
    a clean NotImplementedError with zero frames, not duplicates)."""
    from finanalyzer_spark.operators.mp4 import mux_mp4_avc
    from finanalyzer_spark.operators.multimodal import (
        demux_video_compressed,
    )

    frames = _translating(2, h=16, w=32)
    good = encode_h264_video(frames, qp=30, gop=2, yuv=True)
    bad_p = _BitWriter()
    bad_p.ue(0)   # first_mb
    bad_p.ue(5)   # slice_type P
    bad_p.ue(0)   # pps_id
    bad_p.u(2, 8)  # frame_num
    bad_p.u(1, 1)  # num_ref_idx_active_override_flag
    bad_p.ue(1)   # num_ref_idx_l0_active_minus1 = 1 → multi-ref,
    #               refused by the pure tier
    bad_p.rbsp_trailing()
    stream = good + _nal(NAL_SLICE, 2, bytes(bad_p.out))
    mp4 = mux_mp4_avc([], annexb=stream)
    gen = demux_video_compressed(mp4)
    emitted = []
    with pytest.raises(NotImplementedError):
        for item in gen:
            emitted.append(item)
    assert emitted == []  # no partial sequence before the refusal


def test_partitioned_p_macroblocks_roundtrip():
    """Round 7: P_L0_L0_16x8 / 8x16 decode natively.  Content whose
    motion boundary cuts THROUGH macroblocks (top half pans, bottom
    static; then left/right) makes the RD loop pick the partitioned
    shapes, and decode must equal the encoder reconstruction
    bit-for-bit — including through the deblocking filter, whose
    boundary-strength motion test now runs per 4x4 block pair."""
    rng = np.random.default_rng(17)
    h, w = 48, 64
    noisy = (
        (np.add.outer(np.arange(h) * 5, np.arange(w) * 3)) % 256
        + rng.integers(-9, 10, (h, w))
    ).clip(0, 255).astype(np.uint8)
    # noise-free twin: with a perfect two-half pan both 8x16 and P_8x8
    # reach zero SSD, so the cheaper-bits 8x16 must win the RD tie
    clean = (
        np.add.outer(np.arange(h) * 5, np.arange(w) * 3) % 256
    ).astype(np.uint8)
    cbp = np.full((h // 2, w // 2), 115, np.uint8)
    crp = np.full((h // 2, w // 2), 140, np.uint8)

    def shifted(base, horiz_split):
        out = base.copy()
        if horiz_split:  # top half pans right by 4 px → 16x8 shapes
            out[: h // 2] = np.roll(base[: h // 2], 4, axis=1)
        else:  # left half pans down by 4 px → 8x16 shapes
            out[:, : w // 2] = np.roll(base[:, : w // 2], 4, axis=0)
        return out

    frames = [
        (noisy, cbp, crp),
        (shifted(noisy, True), cbp, crp),
        (clean, cbp, crp),
        (shifted(clean, False), cbp, crp),
    ]
    rec: list = []
    stream = encode_h264_video(
        frames, qp=28, gop=6, yuv=True, search_range=5, recon_out=rec
    )
    census = _mb_census(stream)
    n_16x8 = sum(c.get("p16x8", 0) for c in census)
    n_8x16 = sum(c.get("p8x16", 0) for c in census)
    n_p8x8 = sum(c.get("p8x8", 0) for c in census)
    assert n_16x8 > 0, census
    assert n_8x16 > 0, census
    assert n_p8x8 > 0, census
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == 4
    for (_fno, got), want in zip(decoded, rec):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)
    # same content THROUGH the in-loop filter (default-flag stream)
    rec2: list = []
    s2 = encode_h264_video(
        frames, qp=28, gop=6, yuv=True, search_range=5,
        recon_out=rec2, deblock=True,
    )
    for (_fno, got), want in zip(
        decode_h264_annexb(s2, yuv=True), rec2
    ):
        for g, x in zip(got, want):
            assert np.array_equal(g, x)


def test_weighted_prediction_fade():
    """Explicit weighted prediction (8.4.2.3): a fade-to-half scene
    coded with luma weights (lwd=5, w=16 → x0.5) must stay bit-exact
    through the closed loop (with and without the in-loop filter) and
    code substantially smaller than the unweighted stream — the tool's
    whole purpose.  Also pins the wp_apply arithmetic on hand vectors
    including a negative weight and the lwd=0 path."""
    from finanalyzer_spark.operators.h264_inter import wp_apply

    assert wp_apply(np.array([100]), 16, 0, 5)[0] == 50
    assert wp_apply(np.array([100]), 32, 10, 5)[0] == 110
    assert wp_apply(np.array([100]), 1, -20, 0)[0] == 80
    assert wp_apply(np.array([200]), -16, 200, 5)[0] == 100
    assert wp_apply(np.array([255]), 40, 100, 5)[0] == 255  # Clip1

    rng = np.random.default_rng(23)
    h, w = 48, 64
    base = (
        (np.add.outer(np.arange(h) * 4, np.arange(w) * 2)) % 256
        + rng.integers(-5, 6, (h, w))
    ).clip(0, 255).astype(np.uint8)
    cbp = np.full((h // 2, w // 2), 120, np.uint8)
    crp = np.full((h // 2, w // 2), 130, np.uint8)
    fade = (base.astype(np.int64) // 2).astype(np.uint8)
    frames = [(base, cbp, crp), (fade, cbp, crp)]
    for deblock in (False, True):
        rec: list = []
        bits = encode_h264_video(
            frames, qp=24, gop=2, yuv=True, recon_out=rec,
            wp=(5, 16, 0), deblock=deblock,
        )
        outs = list(decode_h264_annexb(bits, yuv=True))
        for (_f, dec), exp in zip(outs, rec):
            for d, e in zip(dec, exp):
                assert np.array_equal(d, e)
        nowp = encode_h264_video(
            frames, qp=24, gop=2, yuv=True, deblock=deblock
        )
        assert len(bits) < len(nowp)
