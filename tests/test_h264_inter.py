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


def test_mv_prediction_rules():
    grid = [[None, None, None], [None, None, None]]
    # nothing decoded → zero
    assert predict_mv(grid, 0, 0, 3) == (0, 0)
    # top row with left inter neighbour → A (8.4.1.3.2 special case)
    grid[0][0] = (12, -4)
    assert predict_mv(grid, 1, 0, 3) == (12, -4)
    # exactly one inter neighbour among A/B/C → that one
    grid2 = [[None, (8, 2), None], [None, None, None]]
    assert predict_mv(grid2, 1, 1, 3) == (8, 2)
    # three inter neighbours → component-wise median
    grid3 = [[(0, 0), (4, 8), (16, -4)], [(8, 2), None, None]]
    assert predict_mv(grid3, 1, 1, 3) == (8, 2)  # med(8,4,16), med(2,8,-4)
    # skip: zero when left/above missing or zero-MV
    assert skip_mv(grid3, 0, 1, 3) == (0, 0)  # left edge
    # above neighbour has a zero MV → skip MV forced to zero
    assert skip_mv([[None, (0, 0)], [(4, 4), None]], 1, 1, 2) == (0, 0)
    g = [[(4, 4), (4, 4)], [(4, 4), None]]
    assert skip_mv(g, 1, 1, 2) == (4, 4)


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


def test_partitioned_p_macroblock_refused():
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
    # hand-build a P slice whose first MB is P_8x8 (mb_type 3):
    # mb_skip_run=0 then mb_type=3
    from finanalyzer_spark.operators.h264 import _BitWriter

    s = _BitWriter()
    s.ue(0)  # mb_skip_run
    s.ue(3)  # P_8x8
    s.rbsp_trailing()
    r = _BitReader(bytes(s.out))
    with pytest.raises(NotImplementedError, match="partitioned"):
        decode_slice(r, sps, pps, 30, True, "P", ref)


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
