"""Foreign-stream conformance vectors for the pure H.264 tier
(VERDICT r7 #2): break the encoder-twin closed loop.

No reference encoder (x264/ffmpeg/JM) or conformant decoder (PyAV)
exists in this sandbox and there is no network, so a captured
third-party bitstream cannot be pinned.  The next-strongest artifact,
explicitly sanctioned by the round-7 verdict ("or hand-assembled per
spec"), is built here:

- the STREAMS are assembled by a standalone bit-writer in this file,
  translating ITU-T H.264 §7.3 syntax tables field by field — no
  import from operators/h264_inter or h264_cavlc's encoder side, so
  an encoder-twin bug cannot shape these bytes;
- the EXPECTED PIXELS are computed by independent re-implementations
  of the §8.3/8.4 arithmetic (DC prediction, clamped 6-tap half-pel
  MC, eighth-pel chroma MC, bi-prediction rounding) written fresh in
  this file with plain numpy — no import from the decoder, so a
  decoder bug cannot shape the expectation either;
- both streams and expectations are FROZEN by pinned SHA-256 digests,
  so silent edits to either side of this file fail loudly.

What remains non-independent: the CAVLC VLC table VALUES (the streams
only exercise the structural entries: TotalCoeff=0 tokens for nC<2
and nC>=8).  Those tables are pinned separately against the published
Richardson worked example and prefix-free/Kraft completeness tests in
tests/test_h264_cavlc.py.

Vectors:
  A — CAVLC baseline intra: I_16x16 DC-prediction macroblocks (zero
      residual) interleaved with I_PCM gradient macroblocks, so the
      DC predictors average hand-known PCM boundaries (incl. the
      nC>=8 coeff_token row via PCM neighbours).
  B — P-GOP: I_PCM gradient reference, then a P picture covering
      integer / horizontal-half / vertical-half / centre-half motion,
      median MV prediction (8.4.1.3), and a trailing P_Skip with the
      full median derivation.
  C — B-GOP (Main profile, POC type 0): I_PCM references, one B
      picture with Bi / L0 / L1 / spatial-direct macroblocks, POC
      display reordering checked on the emitted frame order.
  D — explicit weighted prediction (7.3.3.2 pred_weight_table): luma
      weighting saturates at the bright end, asymmetric chroma
      weights/offsets — every output pixel is the 8.4.2.3.2 formula
      on a hand-known reference pixel.
  E — temporal direct mode (8.4.1.2.3): B motion derived purely from
      POC distances against the colocated P motion (DistScaleFactor
      128 → exact half forward / half backward), half-pel fetches on
      both lists.
  F — multi-reference P with 8.2.4.3.1 list modification: two PCM
      references, a modification command re-ordering RefPicList0,
      te(v) ref_idx selection of both pictures, and the refIdx-aware
      MV prediction shortcuts.
"""

from __future__ import annotations

import hashlib

import numpy as np

from finanalyzer_spark.operators.h264 import decode_h264_annexb

# ---------------------------------------------------------------------------
# standalone assembler (ITU-T §7.3 / Annex B; no repo encoder imports)
# ---------------------------------------------------------------------------


class _W:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)  # pcm_alignment_zero_bit

    def raw(self, data: bytes):
        assert len(self.bits) % 8 == 0
        for b in data:
            self.u(b, 8)

    def trailing(self):
        self.bits.append(1)  # rbsp_stop_one_bit
        self.align()

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    # emulation prevention (7.4.1.1): 00 00 0x -> 00 00 03 0x
    out = bytearray(b"\x00\x00\x00\x01")
    out.append((ref_idc << 5) | nal_type)
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _sps(profile: int, poc_type: int, num_ref: int) -> bytes:
    w = _W()
    w.u(profile, 8)
    w.u(0, 8)       # constraint flags + reserved
    w.u(20, 8)      # level_idc 2.0
    w.ue(0)         # sps_id
    w.ue(0)         # log2_max_frame_num_minus4 -> 4 bits
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(0)     # log2_max_pic_order_cnt_lsb_minus4 -> 4 bits
    w.ue(num_ref)   # max_num_ref_frames
    w.u(0, 1)       # gaps_in_frame_num_value_allowed
    w.ue(1)         # pic_width_in_mbs_minus1 -> 2 (32 px)
    w.ue(1)         # pic_height_in_map_units_minus1 -> 2 (32 px)
    w.u(1, 1)       # frame_mbs_only_flag
    w.u(1, 1)       # direct_8x8_inference_flag
    w.u(0, 1)       # frame_cropping_flag
    w.u(0, 1)       # vui_parameters_present_flag
    w.trailing()
    return w.bytes()


def _pps(qp: int, weighted_pred: int = 0) -> bytes:
    w = _W()
    w.ue(0)         # pps_id
    w.ue(0)         # sps_id
    w.u(0, 1)       # entropy_coding_mode: CAVLC
    w.u(0, 1)       # bottom_field_pic_order_in_frame_present
    w.ue(0)         # num_slice_groups_minus1
    w.ue(0)         # num_ref_idx_l0_default_active_minus1
    w.ue(0)         # num_ref_idx_l1_default_active_minus1
    w.u(weighted_pred, 1)  # weighted_pred_flag
    w.u(0, 2)       # weighted_bipred_idc
    w.se(qp - 26)   # pic_init_qp_minus26
    w.se(0)         # pic_init_qs_minus26
    w.se(0)         # chroma_qp_index_offset
    w.u(1, 1)       # deblocking_filter_control_present_flag
    w.u(0, 1)       # constrained_intra_pred_flag
    w.u(0, 1)       # redundant_pic_cnt_present_flag
    w.trailing()
    return w.bytes()


def _slice_header(w: _W, kind: str, frame_num: int, idr: bool,
                  poc_lsb: int | None = None,
                  spatial_direct: bool = True):
    w.ue(0)                                  # first_mb_in_slice
    w.ue({"I": 7, "P": 5, "B": 6}[kind])     # slice_type
    w.ue(0)                                  # pps_id
    w.u(frame_num, 4)                        # frame_num
    if idr:
        w.ue(0)                              # idr_pic_id
    if poc_lsb is not None:
        w.u(poc_lsb, 4)                      # pic_order_cnt_lsb
    if kind == "B":
        w.u(1 if spatial_direct else 0, 1)   # direct_spatial_mv_pred
    if kind in ("P", "B"):
        w.u(0, 1)                            # num_ref_idx_override
        w.u(0, 1)                            # ref_pic_list_mod l0
        if kind == "B":
            w.u(0, 1)                        # ref_pic_list_mod l1


def _slice_tail(w: _W, ref: bool, idr: bool):
    if ref:                                  # dec_ref_pic_marking
        if idr:
            w.u(0, 1)                        # no_output_of_prior_pics
            w.u(0, 1)                        # long_term_reference
        else:
            w.u(0, 1)                        # adaptive_marking_mode
    w.se(0)                                  # slice_qp_delta
    w.ue(1)                                  # disable_deblocking: ON


def _pcm_mb(w: _W, y16: np.ndarray, cb8: np.ndarray, cr8: np.ndarray):
    w.align()
    w.raw(bytes(y16.astype(np.uint8).ravel()))
    w.raw(bytes(cb8.astype(np.uint8).ravel()))
    w.raw(bytes(cr8.astype(np.uint8).ravel()))


# ---------------------------------------------------------------------------
# independent §8.3 / §8.4 arithmetic (plain numpy, no decoder imports)
# ---------------------------------------------------------------------------

_TAPS = np.array([1, -5, 20, 20, -5, 1], dtype=np.int64)


def _mc_luma(ref, px, py, mvx, mvy, bh=16, bw=16):
    """8.4.2.2: clamped full-sample grid + 6-tap half-pel (frac 0/2)."""
    ix, fx, iy, fy = mvx >> 2, mvx & 3, mvy >> 2, mvy & 3
    assert fx in (0, 2) and fy in (0, 2)
    h, w = ref.shape
    rows = np.clip(np.arange(py + iy - 2, py + iy + bh + 3), 0, h - 1)
    cols = np.clip(np.arange(px + ix - 2, px + ix + bw + 3), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    if fx == 0 and fy == 0:
        out = win[2 : 2 + bh, 2 : 2 + bw]
    elif fx == 2 and fy == 0:
        acc = sum(_TAPS[k] * win[2 : 2 + bh, k : k + bw] for k in range(6))
        out = (acc + 16) >> 5
    elif fx == 0 and fy == 2:
        acc = sum(_TAPS[k] * win[k : k + bh, 2 : 2 + bw] for k in range(6))
        out = (acc + 16) >> 5
    else:  # centre half-pel j: horizontal intermediates, then vertical
        mid = sum(_TAPS[k] * win[:, k : k + bw] for k in range(6))
        acc = sum(_TAPS[k] * mid[k : k + bh, :] for k in range(6))
        out = (acc + 512) >> 10
    return np.clip(out, 0, 255)


def _mc_chroma(ref, cx, cy, mvx, mvy, bh=8, bw=8):
    """8.4.2.2.2: eighth-pel bilinear with clamped fetches."""
    ix, fx, iy, fy = mvx >> 3, mvx & 7, mvy >> 3, mvy & 7
    h, w = ref.shape
    rows = np.clip(np.arange(cy + iy, cy + iy + bh + 1), 0, h - 1)
    cols = np.clip(np.arange(cx + ix, cx + ix + bw + 1), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    a = win[:bh, :bw]
    b = win[:bh, 1 : bw + 1]
    c = win[1 : bh + 1, :bw]
    d = win[1 : bh + 1, 1 : bw + 1]
    return (
        (8 - fx) * (8 - fy) * a
        + fx * (8 - fy) * b
        + (8 - fx) * fy * c
        + fx * fy * d
        + 32
    ) >> 6


def _dc16(t, l, have_t, have_l):
    """8.3.3 Intra_16x16_DC."""
    if have_t and have_l:
        return (int(t.sum()) + int(l.sum()) + 16) >> 5
    if have_t:
        return (int(t.sum()) + 8) >> 4
    if have_l:
        return (int(l.sum()) + 8) >> 4
    return 128


def _dc_chroma(t, l, have_t, have_l):
    """8.3.4.1: per-4x4-quadrant chroma DC."""
    out = np.zeros((8, 8), dtype=np.int64)
    for qy in (0, 4):
        for qx in (0, 4):
            ts = int(t[qx : qx + 4].sum()) if have_t else 0
            ls = int(l[qy : qy + 4].sum()) if have_l else 0
            on_diag = (qx == 0 and qy == 0) or (qx == 4 and qy == 4)
            if on_diag and have_t and have_l:
                v = (ts + ls + 4) >> 3
            elif (qx == 4 and qy == 0 and have_t) or (
                on_diag and have_t and not have_l
            ):
                v = (ts + 2) >> 2
            elif (qx == 0 and qy == 4 and have_l) or (
                on_diag and have_l and not have_t
            ):
                v = (ls + 2) >> 2
            elif qx == 4 and qy == 0 and have_l:
                v = (ls + 2) >> 2
            elif qx == 0 and qy == 4 and have_t:
                v = (ts + 2) >> 2
            else:
                v = 128
            out[qy : qy + 4, qx : qx + 4] = v
    return out


def _median3(a, b, c):
    return sorted((a, b, c))[1]


# ---------------------------------------------------------------------------
# PCM patterns (hand-chosen gradients, no clipping anywhere)
# ---------------------------------------------------------------------------

_R16, _C16 = np.mgrid[0:16, 0:16]
_R8, _C8 = np.mgrid[0:8, 0:8]

PA_Y = 40 + 6 * _R16 + 5 * _C16
PA_CB = 60 + 3 * _R8 + 2 * _C8
PA_CR = 190 - 4 * _R8 - 3 * _C8
PB_Y = 220 - 5 * _R16 - 6 * _C16
PB_CB = 30 + 5 * _R8 + _C8
PB_CR = 80 + 2 * _R8 + 4 * _C8

_R32, _C32 = np.mgrid[0:32, 0:32]
_R16g, _C16g = np.mgrid[0:16, 0:16]
REF_Y = 30 + 2 * _R32 + 4 * _C32          # even slopes: exact halves
REF_CB = 60 + 3 * _R16g + 2 * _C16g
REF_CR = 20 + 2 * _R16g + 5 * _C16g


# ---------------------------------------------------------------------------
# vector builders (stream + independently computed expected frames)
# ---------------------------------------------------------------------------


def build_vector_a():
    """CAVLC intra: [I16DC, PCM-A / PCM-B, I16DC] on a 32x32 IDR."""
    s = _W()
    _slice_header(s, "I", 0, idr=True)
    _slice_tail(s, ref=True, idr=True)
    # MB0: I_16x16_2_0_0 (DC pred, CBP 0) — Table 7-11 mb_type 3
    s.ue(3)
    s.ue(0)         # intra_chroma_pred_mode: DC
    s.se(0)         # mb_qp_delta
    s.u(1, 1)       # DC coeff_token nC<2, TotalCoeff 0: "1"
    # MB1: I_PCM (mb_type 25)
    s.ue(25)
    _pcm_mb(s, PA_Y, PA_CB, PA_CR)
    # MB2: I_PCM
    s.ue(25)
    _pcm_mb(s, PB_Y, PB_CB, PB_CR)
    # MB3: I_16x16_2_0_0 with PCM neighbours -> DC block nC = 16
    s.ue(3)
    s.ue(0)
    s.se(0)
    s.u(0b000011, 6)  # coeff_token nC>=8 FLC, TotalCoeff 0
    s.trailing()
    stream = (
        _nal(7, 3, _sps(66, 2, 1))
        + _nal(8, 3, _pps(26))
        + _nal(5, 3, s.bytes())
    )

    y = np.zeros((32, 32), dtype=np.int64)
    cb = np.zeros((16, 16), dtype=np.int64)
    cr = np.zeros((16, 16), dtype=np.int64)
    y[0:16, 0:16] = _dc16(None, None, False, False)
    cb[0:8, 0:8] = _dc_chroma(None, None, False, False)
    cr[0:8, 0:8] = _dc_chroma(None, None, False, False)
    y[0:16, 16:32] = PA_Y
    cb[0:8, 8:16] = PA_CB
    cr[0:8, 8:16] = PA_CR
    y[16:32, 0:16] = PB_Y
    cb[8:16, 0:8] = PB_CB
    cr[8:16, 0:8] = PB_CR
    y[16:32, 16:32] = _dc16(y[15, 16:32], y[16:32, 15], True, True)
    cb[8:16, 8:16] = _dc_chroma(cb[7, 8:16], cb[8:16, 7], True, True)
    cr[8:16, 8:16] = _dc_chroma(cr[7, 8:16], cr[8:16, 7], True, True)
    return stream, [(y, cb, cr)]


#: vector-B motion vectors (quarter-pel), mb index -> mv
_B_MVS = {0: (16, 8), 1: (10, 0), 2: (0, -6)}


def build_vector_b():
    """P-GOP: PCM gradient IDR, then a P picture with integer /
    h-half / v-half motion and a trailing P_Skip (median MV)."""
    s0 = _W()
    _slice_header(s0, "I", 0, idr=True)
    _slice_tail(s0, ref=True, idr=True)
    for my in (0, 1):
        for mx in (0, 1):
            s0.ue(25)
            _pcm_mb(
                s0,
                REF_Y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
                REF_CB[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                REF_CR[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
            )
    s0.trailing()

    # median MV prediction (8.4.1.3) for the 2x2 layout, hand-derived:
    # MB0: no neighbours -> mvp (0,0).  MB1: only A matches -> mvp =
    # mvA.  MB2: B and C match (A unavailable counts as 0) -> median.
    mvp1 = _B_MVS[0]
    mvp2 = (
        _median3(0, _B_MVS[0][0], _B_MVS[1][0]),
        _median3(0, _B_MVS[0][1], _B_MVS[1][1]),
    )
    # P_Skip MB3: A=MB2, B=MB1, C unavailable -> D=MB0; all ref 0
    mv3 = (
        _median3(_B_MVS[2][0], _B_MVS[1][0], _B_MVS[0][0]),
        _median3(_B_MVS[2][1], _B_MVS[1][1], _B_MVS[0][1]),
    )

    s1 = _W()
    _slice_header(s1, "P", 1, idr=False)
    _slice_tail(s1, ref=True, idr=False)
    for i, mvp in ((0, (0, 0)), (1, mvp1), (2, mvp2)):
        s1.ue(0)                        # mb_skip_run
        s1.ue(0)                        # mb_type P_L0_16x16
        s1.se(_B_MVS[i][0] - mvp[0])    # mvd_l0 x
        s1.se(_B_MVS[i][1] - mvp[1])    # mvd_l0 y
        s1.ue(0)                        # coded_block_pattern 0
    s1.ue(1)                            # trailing skip run (MB3)
    s1.trailing()

    stream = (
        _nal(7, 3, _sps(66, 2, 1))
        + _nal(8, 3, _pps(26))
        + _nal(5, 3, s0.bytes())
        + _nal(1, 2, s1.bytes())
    )

    y = np.zeros((32, 32), dtype=np.int64)
    cb = np.zeros((16, 16), dtype=np.int64)
    cr = np.zeros((16, 16), dtype=np.int64)
    mvs = dict(_B_MVS)
    mvs[3] = mv3
    for i, (my, mx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        mvx, mvy = mvs[i]
        y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = _mc_luma(
            REF_Y, mx * 16, my * 16, mvx, mvy
        )
        cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
            REF_CB, mx * 8, my * 8, mvx, mvy
        )
        cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
            REF_CR, mx * 8, my * 8, mvx, mvy
        )
    return stream, [(REF_Y, REF_CB, REF_CR), (y, cb, cr)]


def build_vector_c():
    """B-GOP, Main profile, POC type 0: flat PCM references, one B
    picture with Bi / L0 / L1 / spatial-direct macroblocks; decode
    order IDR(0) P(4) B(2), display order IDR B P."""
    def flat_pcm_slice(kind, frame_num, idr, poc, yv, cbv, crv,
                       mb_type):
        w = _W()
        _slice_header(w, kind, frame_num, idr=idr, poc_lsb=poc)
        _slice_tail(w, ref=True, idr=idr)
        for _ in range(4):
            if kind == "P":
                w.ue(0)          # mb_skip_run
            w.ue(mb_type)
            _pcm_mb(
                w,
                np.full((16, 16), yv),
                np.full((8, 8), cbv),
                np.full((8, 8), crv),
            )
        w.trailing()
        return w.bytes()

    idr = flat_pcm_slice("I", 0, True, 0, 100, 60, 200, 25)
    pfr = flat_pcm_slice("P", 1, False, 4, 180, 80, 120, 30)

    b = _W()
    _slice_header(b, "B", 2, idr=False, poc_lsb=2)
    # non-reference (nal_ref_idc 0): no dec_ref_pic_marking
    b.se(0)         # slice_qp_delta
    b.ue(1)         # disable_deblocking_filter_idc
    b.ue(0)         # mb_skip_run
    b.ue(3)         # B_Bi_16x16
    for _ in range(4):
        b.se(0)     # mvd_l0 x,y then mvd_l1 x,y
    b.ue(0)         # cbp
    b.ue(0)
    b.ue(1)         # B_L0_16x16
    b.se(0)
    b.se(0)
    b.ue(0)
    b.ue(0)
    b.ue(2)         # B_L1_16x16
    b.se(0)
    b.se(0)
    b.ue(0)
    b.ue(0)
    b.ue(0)         # B_Direct_16x16 (spatial)
    b.ue(0)         # cbp
    b.trailing()

    stream = (
        _nal(7, 3, _sps(77, 0, 2))
        + _nal(8, 3, _pps(26))
        + _nal(5, 3, idr)
        + _nal(1, 2, pfr)
        + _nal(1, 0, b.bytes())
    )

    def flat(yv, cbv, crv):
        return (
            np.full((32, 32), yv, dtype=np.int64),
            np.full((16, 16), cbv, dtype=np.int64),
            np.full((16, 16), crv, dtype=np.int64),
        )

    bi = flat((100 + 180 + 1) >> 1, (60 + 80 + 1) >> 1,
              (200 + 120 + 1) >> 1)
    bfr = flat(0, 0, 0)
    for i, (my, mx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        src = {
            0: bi,                       # Bi
            1: flat(100, 60, 200),       # L0 -> IDR
            2: flat(180, 80, 120),       # L1 -> P
            3: bi,                       # spatial direct, mv 0, bi
        }[i]
        for dst, sp, step in ((0, 0, 16), (1, 1, 8), (2, 2, 8)):
            bfr[dst][
                my * step : my * step + step,
                mx * step : mx * step + step,
            ] = src[dst][
                my * step : my * step + step,
                mx * step : mx * step + step,
            ]
    # display order: IDR (poc 0), B (poc 2), P (poc 4)
    return stream, [flat(100, 60, 200), bfr, flat(180, 80, 120)]


def _pcm_idr_slice(poc_lsb: int | None = None) -> bytes:
    """IDR slice: 4 I_PCM macroblocks carrying REF_Y/CB/CR."""
    s = _W()
    _slice_header(s, "I", 0, idr=True, poc_lsb=poc_lsb)
    _slice_tail(s, ref=True, idr=True)
    for my in (0, 1):
        for mx in (0, 1):
            s.ue(25)
            _pcm_mb(
                s,
                REF_Y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
                REF_CB[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                REF_CR[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
            )
    s.trailing()
    return s.bytes()


def _wp(v, w, lwd, o):
    """8.4.2.3.2 explicit unidirectional weighting, fresh numpy."""
    p = v.astype(np.int64) * w
    if lwd >= 1:
        p = (p + (1 << (lwd - 1))) >> lwd
    return np.clip(p + o, 0, 255)


def build_vector_d():
    """Explicit weighted prediction: PCM gradient reference, then a P
    picture of zero-MV P_L0_16x16 macroblocks under a pred_weight_table
    (luma w=3/lwd=1/o=+10 — saturates at the bright end; chroma
    w=5,o=-8 and w=3,o=+4 at lwd=2), so every output pixel is the
    weighting formula applied to a hand-known reference pixel."""
    lwd, wl, ol = 1, 3, 10
    cwd, wcb, ocb, wcr, ocr = 2, 5, -8, 3, 4
    s1 = _W()
    _slice_header(s1, "P", 1, idr=False)
    # pred_weight_table (7.3.3.2), single active reference
    s1.ue(lwd)
    s1.ue(cwd)
    s1.u(1, 1)      # luma_weight_l0_flag
    s1.se(wl)
    s1.se(ol)
    s1.u(1, 1)      # chroma_weight_l0_flag
    s1.se(wcb)
    s1.se(ocb)
    s1.se(wcr)
    s1.se(ocr)
    _slice_tail(s1, ref=True, idr=False)
    for _ in range(4):
        s1.ue(0)    # mb_skip_run
        s1.ue(0)    # P_L0_16x16
        s1.se(0)    # mvd x (mvp 0 everywhere at zero motion)
        s1.se(0)    # mvd y
        s1.ue(0)    # cbp
    s1.trailing()
    stream = (
        _nal(7, 3, _sps(66, 2, 1))
        + _nal(8, 3, _pps(26, weighted_pred=1))
        + _nal(5, 3, _pcm_idr_slice())
        + _nal(1, 2, s1.bytes())
    )
    wy = _wp(REF_Y, wl, lwd, ol)
    assert int(wy.max()) == 255  # the luma weighting must saturate
    return stream, [
        (REF_Y, REF_CB, REF_CR),
        (wy, _wp(REF_CB, wcb, cwd, ocb), _wp(REF_CR, wcr, cwd, ocr)),
    ]


def build_vector_e():
    """Temporal direct mode (8.4.1.2.3): IDR (poc 0) → P (poc 4,
    uniform mv (8,4) over the IDR) → B (poc 2, direct_spatial=0).
    With tb=2, td=4: tx=4096, DistScaleFactor=128, so mvL0=(4,2) and
    mvL1=(-4,-2) — the B picture averages a half-scaled forward fetch
    from the IDR against a half-backward fetch from the P recon."""
    s1 = _W()
    _slice_header(s1, "P", 1, idr=False, poc_lsb=4)
    _slice_tail(s1, ref=True, idr=False)
    # mvp is (0,0) for MB0 then (8,4) for MB1-3 (median rules)
    for mvd in ((8, 4), (0, 0), (0, 0), (0, 0)):
        s1.ue(0)
        s1.ue(0)    # P_L0_16x16
        s1.se(mvd[0])
        s1.se(mvd[1])
        s1.ue(0)
    s1.trailing()

    b = _W()
    _slice_header(b, "B", 2, idr=False, poc_lsb=2, spatial_direct=False)
    b.se(0)
    b.ue(1)         # deblocking disabled
    for _ in range(4):
        b.ue(0)     # mb_skip_run
        b.ue(0)     # B_Direct_16x16
        b.ue(0)     # cbp
    b.trailing()

    stream = (
        _nal(7, 3, _sps(77, 0, 2))
        + _nal(8, 3, _pps(26))
        + _nal(5, 3, _pcm_idr_slice(poc_lsb=0))
        + _nal(1, 2, s1.bytes())
        + _nal(1, 0, b.bytes())
    )

    def mc_frame(ry, rcb, rcr, mvx, mvy):
        y = np.zeros((32, 32), dtype=np.int64)
        cb = np.zeros((16, 16), dtype=np.int64)
        cr = np.zeros((16, 16), dtype=np.int64)
        for my in (0, 1):
            for mx in (0, 1):
                y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                    _mc_luma(ry, mx * 16, my * 16, mvx, mvy)
                )
                cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
                    rcb, mx * 8, my * 8, mvx, mvy
                )
                cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
                    rcr, mx * 8, my * 8, mvx, mvy
                )
        return y, cb, cr

    p_fr = mc_frame(REF_Y, REF_CB, REF_CR, 8, 4)
    f0 = mc_frame(REF_Y, REF_CB, REF_CR, 4, 2)       # list 0: IDR
    f1 = mc_frame(*p_fr, -4, -2)                     # list 1: P recon
    b_fr = tuple((a + c + 1) >> 1 for a, c in zip(f0, f1))
    # display order: IDR (0), B (2), P (4)
    return stream, [(REF_Y, REF_CB, REF_CR), b_fr, p_fr]


def build_vector_f():
    """Multi-reference P with 8.2.4.3.1 list modification: IDR (PCM
    gradient R0) → P1 (PCM-in-P-slice gradient R1, so the DPB holds
    two references) → P2 with num_ref_idx override to 2 and a
    modification command moving the IDR (picNum 0) to slot 0, so
    ref_idx 0 = R0 and ref_idx 1 = R1.  The four macroblocks exercise
    both references, te(v) ref_idx bits, and the refIdx-aware
    8.4.1.3 prediction rules (B/C-unavailable shortcut, and the
    exactly-one-matching-refIdx shortcut twice)."""
    r1_y = 250 - 2 * _R32 - 4 * _C32
    r1_cb = 200 - 3 * _R16g - 2 * _C16g
    r1_cr = 30 + 4 * _R16g + 2 * _C16g

    p1 = _W()
    _slice_header(p1, "P", 1, idr=False)
    _slice_tail(p1, ref=True, idr=False)
    for my in (0, 1):
        for mx in (0, 1):
            p1.ue(0)     # mb_skip_run
            p1.ue(30)    # P_INTRA_OFFSET(5) + I_PCM(25)
            _pcm_mb(
                p1,
                r1_y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
                r1_cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                r1_cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
            )
    p1.trailing()

    # (ref_idx, mv, mvd) per MB, prediction hand-derived:
    # MB0: no neighbours -> mvp (0,0).  MB1: B/C unavailable -> mvp =
    # mvA regardless of refIdx.  MB2: only B shares refIdx 0 -> mvp =
    # mvB.  MB3: only B shares refIdx 1 -> mvp = mvB.
    mbs = [
        (0, (6, 0), (6, 0)),            # R0, h-half
        (1, (0, 4), (-6, 4)),           # R1, integer
        (0, (8, 0), (2, 0)),            # R0, integer
        (1, (0, 8), (0, 4)),            # R1, integer
    ]
    p2 = _W()
    p2.ue(0)        # first_mb_in_slice
    p2.ue(5)        # slice_type P
    p2.ue(0)        # pps_id
    p2.u(2, 4)      # frame_num
    p2.u(1, 1)      # num_ref_idx_active_override_flag
    p2.ue(1)        # num_ref_idx_l0_active_minus1 -> 2 refs
    p2.u(1, 1)      # ref_pic_list_modification_flag_l0
    p2.ue(0)        # idc 0: subtract
    p2.ue(1)        # abs_diff 2: picNum 0 (the IDR) to slot 0
    p2.ue(3)        # end of modification ops
    p2.u(0, 1)      # adaptive_ref_pic_marking_mode_flag
    p2.se(0)        # slice_qp_delta
    p2.ue(1)        # disable_deblocking_filter_idc
    for ref_idx, _mv, mvd in mbs:
        p2.ue(0)                    # mb_skip_run
        p2.ue(0)                    # P_L0_16x16
        p2.u(1 - ref_idx, 1)        # te(v), max 1: inverted bit
        p2.se(mvd[0])
        p2.se(mvd[1])
        p2.ue(0)                    # cbp
    p2.trailing()

    stream = (
        _nal(7, 3, _sps(66, 2, 2))
        + _nal(8, 3, _pps(26))
        + _nal(5, 3, _pcm_idr_slice())
        + _nal(1, 2, p1.bytes())
        + _nal(1, 2, p2.bytes())
    )

    refs = {
        0: (REF_Y, REF_CB, REF_CR),
        1: (r1_y, r1_cb, r1_cr),
    }
    y = np.zeros((32, 32), dtype=np.int64)
    cb = np.zeros((16, 16), dtype=np.int64)
    cr = np.zeros((16, 16), dtype=np.int64)
    for i, (ref_idx, (mvx, mvy), _mvd) in enumerate(mbs):
        my, mx = divmod(i, 2)
        ry, rcb, rcr = refs[ref_idx]
        y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = _mc_luma(
            ry, mx * 16, my * 16, mvx, mvy
        )
        cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
            rcb, mx * 8, my * 8, mvx, mvy
        )
        cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _mc_chroma(
            rcr, mx * 8, my * 8, mvx, mvy
        )
    return stream, [
        (REF_Y, REF_CB, REF_CR),
        (r1_y, r1_cb, r1_cr),
        (y, cb, cr),
    ]


# ---------------------------------------------------------------------------
# pinned digests: the frozen fixture identity.  If an edit to the
# assembler or the expectation code changes bytes or planes, these
# fail first and force a deliberate re-pin with review.
# ---------------------------------------------------------------------------

PINNED = {
    "a": (
        "be4147a204338a20bbb50acd5e0e4f81",
        "86379d32ef5d2d31008dae8d049a9246",
    ),
    "b": (
        "929d284581e0de76192db750b7592986",
        "143cc9027e37447f80476786d9934bc9",
    ),
    "c": (
        "ee8b37404405365ac11befe98efef533",
        "ddb5ceb72d83fb9c0baa1469224a5946",
    ),
    "d": (
        "067c3b7dee3cd1c98db719a90228f46d",
        "2f841b3f646abdd92e13739ba78e5576",
    ),
    "e": (
        "e810eb2cae295992d64190f895707bc7",
        "64fb1c5c3b6bcfb287dc3d5642da312a",
    ),
    "f": (
        "04469e8800d3f84cb1a7c460088c373b",
        "866015e254cea7be9090413ed742b5ab",
    ),
}


def _sha_stream(stream: bytes) -> str:
    return hashlib.sha256(stream).hexdigest()[:32]


def _sha_planes(frames) -> str:
    h = hashlib.sha256()
    for planes in frames:
        for p in planes:
            h.update(np.ascontiguousarray(p.astype(np.uint8)).tobytes())
    return h.hexdigest()[:32]


def _run(name, builder):
    stream, expected = builder()
    pin_s, pin_p = PINNED[name]
    assert _sha_stream(stream) == pin_s, f"vector {name}: stream drifted"
    assert _sha_planes(expected) == pin_p, f"vector {name}: planes drifted"
    decoded = list(decode_h264_annexb(stream, yuv=True))
    assert len(decoded) == len(expected)
    for fno, ((got_no, got), want) in enumerate(zip(decoded, expected)):
        assert got_no == fno
        for gp, wp, pn in zip(got, want, "y cb cr".split()):
            assert np.array_equal(
                gp, wp.astype(np.uint8)
            ), f"vector {name} frame {fno} plane {pn} mismatch"


def test_conformance_vector_a_cavlc_intra():
    _run("a", build_vector_a)


def test_conformance_vector_b_pgop_motion():
    _run("b", build_vector_b)


def test_conformance_vector_c_bgop_poc():
    _run("c", build_vector_c)


def test_conformance_vector_d_weighted_prediction():
    _run("d", build_vector_d)


def test_conformance_vector_e_temporal_direct():
    _run("e", build_vector_e)


def test_conformance_vector_f_multiref_list_modification():
    _run("f", build_vector_f)
