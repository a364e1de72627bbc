"""Pure-python H.264 (ITU-T H.264 / MPEG-4 AVC) Annex-B layer.

Two honest tiers, continuing the codec-tier discipline of
operators/multimodal.py:

* **Stream indexing — any H.264 stream.** `split_annexb` (start-code
  scan + emulation-prevention unescape), `parse_sps` (exp-Golomb
  syntax: profile/level, frame dimensions incl. cropping, chroma
  format), `parse_pps`, and `h264_stream_index` (per-NAL type/size +
  IDR keyframe flags + resolution).  A video corpus pipeline gets
  resolution filtering, keyframe counting and codec metadata at
  100 TB without any codec library — the same sample-level posture as
  operators/mp4.demux_mp4.
* **Pixel decode — intra pictures.** `decode_h264_annexb` decodes
  baseline intra streams: I_PCM macroblocks (mb_type 25, raw 4:2:0
  samples — the spec's always-decodable escape hatch, emitted by the
  lossless `encode_h264_ipcm` twin) and, via
  operators/h264_cavlc.decode_islice, CAVLC-entropy I_4x4 / I_16x16
  macroblocks with full spatial prediction (emitted by the
  `encode_h264_intra` twin).  The I_PCM round trip is pinned by exact
  equality; the CAVLC tier is pinned decode == encoder-reconstruction
  bit-for-bit plus an external published conformance vector
  (tests/test_h264_cavlc.py — see h264_cavlc's module docstring for
  the sibling-bug defences).  P slices decode too — P_Skip and
  P_L0_16x16 motion compensation with exact quarter-pel
  interpolation over MULTIPLE reference frames (te(v) ref_idx per
  partition, refIdx-aware 8.4.1.3 prediction, sliding-window DPB;
  operators/h264_inter, twin `encode_h264_video`) — and the §8.7
  in-loop deblocking filter
  (operators/h264_deblock) runs whenever the stream does not disable
  it, so DEFAULT-flag baseline streams decode exactly.  P
  macroblocks cover every partition shape — 16x16, 16x8 / 8x16
  (directional predictors over the 4x4-granularity MV field), and
  P_8x8 sub-partitions down to 4x4 — plus explicit weighted
  prediction (8.4.2.3, the fade tool).  B slices decode with EVERY
  Table 7-14/7-18 macroblock shape — B_Skip / B_Direct_16x16
  (spatial direct), B_L0/L1/Bi 16x16, all two-partition 16x8 / 8x16
  list combinations, and B_8x8 sub-partitions down to 4x4 incl.
  B_Direct_8x8 — over one reference per list with default
  bi-prediction averaging, both direct derivations (spatial
  8.4.1.2.2 and POC-scaled temporal 8.4.1.2.3) and POC type 0
  output re-ordering to display order — and the §8.7 filter runs
  inside B slices too (two-list boundary-strength derivation plus
  the different-reference rule for multi-ref P edges), so
  DEFAULT-flag IBP streams decode exactly — and P slices honour
  short-term reference-list re-ordering (8.2.4.3.1 PicNum ops);
  CABAC, long-term references, multi-ref B slices and weighted
  prediction over several references raise NotImplementedError
  naming the PyAV tier: exact-or-refuse.

Spec grounding: ITU-T H.264 syntax (7.3.x), exp-Golomb (9.1),
emulation prevention (7.4.1.1).  Reference context: the reference
repo has no media surface — extended training-data-pipeline tier.
"""

from __future__ import annotations

#: NAL unit types (Table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9


class _BitReader:
    """MSB-first reader over an RBSP (already unescaped)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            # fail CLOSED on truncated/corrupt payloads: callers
            # route ValueError (malformed) to the PyAV tier
            raise ValueError("truncated RBSP")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_at(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        lo = self.pos >> 3
        if lo + n > len(self.data):
            raise ValueError("truncated RBSP")
        self.pos += 8 * n
        return self.data[lo : lo + n]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self) -> None:
        if self.nbits % 8:
            self.u(0, 8 - self.nbits % 8)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.byte_align_zero()


def _unescape(ebsp: bytes) -> bytes:
    """EBSP → RBSP: drop emulation_prevention_three_byte (00 00 03)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _escape(rbsp: bytes) -> bytes:
    """RBSP → EBSP: insert 00 00 03 before any 00/01/02/03 after two
    zero bytes (7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_annexb(buf: bytes):
    """Yield (nal_type, nal_ref_idc, rbsp_bytes) for each NAL unit in
    an Annex-B byte stream (3- or 4-byte start codes).  ValueError on
    a stream with no start code so callers can route elsewhere."""
    n = len(buf)
    starts = []
    i = 0
    while i + 3 <= n:
        if buf[i] == 0 and buf[i + 1] == 0:
            if buf[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and buf[i + 2] == 0 and buf[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("not an H.264 Annex-B byte stream")
    for si, lo in enumerate(starts):
        hi = n if si + 1 == len(starts) else starts[si + 1] - 3
        # previous start code may have been 4 bytes
        if si + 1 < len(starts) and hi >= 1 and buf[hi - 1] == 0:
            hi -= 1
        nal = buf[lo:hi]
        if not nal:
            continue
        header = nal[0]
        yield header & 0x1F, (header >> 5) & 0x3, _unescape(nal[1:])


def parse_sps(rbsp: bytes) -> dict:
    """Sequence parameter set → profile/level/dimensions (7.3.2.1.1).
    Covers baseline through high (chroma_format_idc branch); returns
    width/height AFTER frame cropping."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    constraints = r.u(8)
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                       139, 134, 135):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            raise NotImplementedError("SPS scaling matrices")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
        log2_max_poc_lsb = 0
    else:
        log2_max_poc_lsb = 0
    num_ref_frames = r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    direct_8x8_inference = r.u(1)
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    # crop units (spec 7.4.2.1.1): CropUnitX = SubWidthC,
    # CropUnitY = SubHeightC * (2 - frame_mbs_only_flag) — interlaced
    # streams crop in frame-pair units vertically
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    crop_unit_y = sub_h * (2 - frame_mbs_only)
    width = pic_width_in_mbs * 16 - sub_w * (crop[0] + crop[1])
    height = (
        pic_height_in_map_units * 16 * (1 if frame_mbs_only else 2)
        - crop_unit_y * (crop[2] + crop[3])
    )
    return {
        "profile_idc": profile_idc,
        "constraints": constraints,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "num_ref_frames": num_ref_frames,
        "direct_8x8_inference": direct_8x8_inference,
        "pic_width_in_mbs": pic_width_in_mbs,
        "pic_height_in_map_units": pic_height_in_map_units,
        "frame_mbs_only": frame_mbs_only,
        "crop": crop,
        "width": width,
        "height": height,
    }


def parse_pps(rbsp: bytes) -> dict:
    """Picture parameter set — the fields the I_PCM slice layer needs
    (7.3.2.2; the tail after entropy_coding_mode governs tools the
    I_PCM tier never touches but the parser must still walk)."""
    r = _BitReader(rbsp)
    pps = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode": r.u(1),
        "bottom_field_pic_order": r.u(1),
    }
    if r.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("slice groups (FMO)")
    pps["num_ref_idx_l0_default"] = r.ue() + 1
    pps["num_ref_idx_l1_default"] = r.ue() + 1
    pps["weighted_pred"] = r.u(1)
    pps["weighted_bipred_idc"] = r.u(2)
    pps["pic_init_qp"] = r.se() + 26
    r.se()  # pic_init_qs
    pps["chroma_qp_index_offset"] = r.se()
    pps["deblocking_filter_control_present"] = r.u(1)
    pps["constrained_intra_pred"] = r.u(1)
    r.u(1)  # redundant_pic_cnt_present
    return pps


def h264_stream_index(buf: bytes) -> dict:
    """Codec-agnostic metadata for an Annex-B stream: NAL histogram,
    IDR (keyframe) count, and resolution/profile/level from the first
    SPS — the 'what is this video' pass a corpus pipeline runs before
    scheduling any decode."""
    n_by_type: dict[int, int] = {}
    sps = None
    pps = None
    n_idr = 0
    n_nals = 0
    for nal_type, _ref, rbsp in split_annexb(buf):
        n_nals += 1
        n_by_type[nal_type] = n_by_type.get(nal_type, 0) + 1
        if nal_type == NAL_SPS and sps is None:
            sps = parse_sps(rbsp)
        elif nal_type == NAL_PPS and pps is None:
            pps = parse_pps(rbsp)
        elif nal_type == NAL_IDR:
            n_idr += 1
    return {
        "n_nals": n_nals,
        "n_idr": n_idr,
        "n_by_type": n_by_type,
        "width": sps["width"] if sps else None,
        "height": sps["height"] if sps else None,
        "profile_idc": sps["profile_idc"] if sps else None,
        "level_idc": sps["level_idc"] if sps else None,
        # name the entropy mode up front: CABAC streams refuse in the
        # pure decode tier, and the probe must say WHY
        "entropy": (
            None if pps is None
            else ("cabac" if pps["entropy_coding_mode"] else "cavlc")
        ),
    }


# --------------------------------------------------------------------------
# I_PCM pixel tier
# --------------------------------------------------------------------------
def _rgb_to_yuv420(arr):
    """BT.601 full-range RGB → (Y, Cb, Cr) planes, chroma 2x2-averaged.
    All-integer rounding so the encoder twin is deterministic."""
    import numpy as np

    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255
    )
    cr = np.clip(
        np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255
    )
    cb = np.round(
        (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2])
        / 4.0
    )
    cr = np.round(
        (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2])
        / 4.0
    )
    return (
        y.astype(np.uint8),
        cb.astype(np.uint8),
        cr.astype(np.uint8),
    )


def _yuv420_to_rgb(y, cb, cr):
    import numpy as np

    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64)
    yf = y.astype(np.float64)
    cbf -= 128.0
    crf -= 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(
        np.stack([r, g, b], axis=2).round(), 0, 255
    ).astype(np.uint8)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + _escape(
        rbsp
    )


def write_sps_pps(
    mbw: int,
    mbh: int,
    pic_init_qp: int = 26,
    deblocking_control: bool = False,
    num_ref_l0_default: int = 1,
    constrained_intra_pred: bool = False,
    weighted_pred: bool = False,
    poc_type: int = 2,
    num_ref_frames: int = 1,
    cabac: bool = False,
) -> tuple[bytes, bytes]:
    """Baseline-profile SPS + PPS RBSP pair shared by the encoder
    twins (I_PCM and CAVLC intra): level 3.0, poc_type 2, CAVLC,
    single slice group, 4:2:0.  `deblocking_control` turns on
    deblocking_filter_control_present so the slice header can carry
    disable_deblocking_filter_idc (the CAVLC twin disables the filter
    explicitly; the I_PCM twin doesn't need to — its deblock QP is 0,
    spec 8.7, so the default-on filter is a no-op).
    `num_ref_l0_default` / `constrained_intra_pred` exist for the
    refusal-path tests: the encoder twins always use 1 / False.

    The B-GOP twin (encode_h264_video with b_frames > 0) passes
    `poc_type=0` (explicit pic_order_cnt_lsb, 8 bits — decode order
    differs from display order) and `num_ref_frames=2` (the previous
    and next reference around each B picture); profile becomes Main
    (77), since B slices are outside baseline."""
    sps = _BitWriter()
    if poc_type == 0:
        sps.u(77, 8)   # profile_idc: main (B slices)
        sps.u(0x40, 8)  # constraint_set1 (main-conforming)
    else:
        sps.u(66, 8)   # profile_idc: baseline
        sps.u(0xC0, 8)  # constraint_set0/1
    sps.u(30, 8)   # level 3.0
    sps.ue(0)      # sps_id
    sps.ue(4)      # log2_max_frame_num_minus4 → 8 bits
    sps.ue(poc_type)  # pic_order_cnt_type
    if poc_type == 0:
        sps.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 → 8 bits
    sps.ue(num_ref_frames)  # max_num_ref_frames
    sps.u(0, 1)    # gaps_in_frame_num
    sps.ue(mbw - 1)
    sps.ue(mbh - 1)
    sps.u(1, 1)    # frame_mbs_only
    sps.u(1, 1)    # direct_8x8_inference
    sps.u(0, 1)    # frame_cropping_flag
    sps.u(0, 1)    # vui_parameters_present
    sps.rbsp_trailing()

    pps = _BitWriter()
    pps.ue(0)      # pps_id
    pps.ue(0)      # sps_id
    # cabac=True exists ONLY for probe/refusal fixtures — the pure
    # tier refuses to DECODE CABAC (no external conformance vector in
    # this environment; SCALE.md §media), but probing must still NAME
    # the entropy mode so a user sees why their stream refuses
    pps.u(1 if cabac else 0, 1)  # entropy_coding_mode
    pps.u(0, 1)    # bottom_field_pic_order
    pps.ue(0)      # num_slice_groups_minus1
    pps.ue(num_ref_l0_default - 1)  # num_ref_idx_l0_default
    pps.ue(0)      # num_ref_idx_l1
    pps.u(1 if weighted_pred else 0, 1)  # weighted_pred
    pps.u(0, 2)    # weighted_bipred
    pps.se(pic_init_qp - 26)  # pic_init_qp_minus26
    pps.se(0)      # pic_init_qs_minus26
    pps.se(0)      # chroma_qp_index_offset
    pps.u(1 if deblocking_control else 0, 1)
    pps.u(1 if constrained_intra_pred else 0, 1)
    pps.u(0, 1)    # redundant_pic_cnt_present
    pps.rbsp_trailing()
    return bytes(sps.out), bytes(pps.out)


def encode_h264_ipcm(frames, yuv: bool = False) -> bytes:
    """Encoder twin: an Annex-B baseline stream of IDR-only frames
    whose macroblocks are all I_PCM — spec-valid (any conformant
    decoder plays it) and LOSSLESS at the YCbCr level.  `frames` are
    (h, w, 3) uint8 RGB arrays (converted to 4:2:0 YCbCr), or, with
    `yuv=True`, (y, cb, cr) plane tuples used verbatim (the exactness
    path the tests pin).  Dimensions must be multiples of 16 (I_PCM
    has no partial-macroblock story without cropping games)."""
    import numpy as np

    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    if yuv:
        planes = [tuple(np.asarray(p, dtype=np.uint8) for p in f) for f in frames]
        h, w = planes[0][0].shape
    else:
        arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
        h, w = arrs[0].shape[:2]
        planes = [_rgb_to_yuv420(a) for a in arrs]
    if h % 16 or w % 16:
        raise ValueError("I_PCM encoder needs multiple-of-16 dimensions")
    mbw, mbh = w // 16, h // 16

    sps_rbsp, pps_rbsp = write_sps_pps(mbw, mbh)
    out = bytearray()
    out += _nal(NAL_SPS, 3, sps_rbsp)
    out += _nal(NAL_PPS, 3, pps_rbsp)
    for fi, (y, cb, cr) in enumerate(planes):
        s = _BitWriter()
        s.ue(0)           # first_mb_in_slice
        s.ue(7)           # slice_type: I (all slices in pic)
        s.ue(0)           # pps_id
        s.u(0, 8)         # frame_num (log2_max_frame_num = 8)
        s.ue(fi % 16)     # idr_pic_id
        # poc_type 2 → no poc syntax; IDR dec_ref_pic_marking:
        s.u(0, 1)         # no_output_of_prior_pics
        s.u(0, 1)         # long_term_reference
        s.se(0)           # slice_qp_delta
        for mb in range(mbw * mbh):
            s.ue(25)      # mb_type I_PCM
            s.byte_align_zero()  # pcm_alignment_zero_bit(s)
            my, mx = divmod(mb, mbw)
            yb = y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
            cbb = cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            crb = cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            for row in yb:
                for v in row:
                    s.u(int(v), 8)
            for blk in (cbb, crb):
                for row in blk:
                    for v in row:
                        s.u(int(v), 8)
        s.rbsp_trailing()
        out += _nal(NAL_IDR, 3, bytes(s.out))
    return bytes(out)


def decode_h264_annexb(buf: bytes, yuv: bool = False,
                       counts_out: list | None = None):
    """Decode an Annex-B H.264 stream whose coded macroblocks are all
    intra-coded (I_PCM, CAVLC I_4x4/I_16x16 — any mix), P slices
    with any partition shape (P_Skip / 16x16 / 16x8 / 8x16 / P_8x8
    sub-partitions down to 4x4) over one or MORE references (te(v)
    ref_idx per partition against the sliding-window DPB), or B slices
    with every Table 7-14/7-18 macroblock shape (B_Skip / direct via
    spatial OR temporal direct mode, 16x16 / 16x8 / 8x16 / B_8x8
    sub-partitions in every L0/L1/Bi combination) over one reference
    per list — with the §8.7 in-loop deblocking
    filter applied per picture unless the slice header disables it
    (alpha/beta offsets honoured) and explicit weighted prediction
    when the PPS enables it.  Yields (frame_no, (h, w, 3) uint8 RGB)
    — or (frame_no, (y, cb, cr)) planes with `yuv=True` — in DISPLAY
    (pic-order-count) order: streams with B pictures carry POC type 0
    and the decoder re-orders output through a bounded pending buffer
    (bumping depth 1 — one B layer, the GOP shapes the twin emits and
    the common IBP web-encode shape).  P reference lists honour
    short-term re-ordering ops (8.2.4.3.1).  CABAC, long-term
    references and multi-ref B slices raise NotImplementedError
    naming the PyAV tier (exact-or-refuse; see the module docstrings
    here, in h264_cavlc, h264_inter and h264_deblock)."""
    import numpy as np

    sps = pps = None
    #: decoded-picture buffer of REFERENCE pictures in decode order:
    #: (poc, planes int64, motion dict) — motion (4x4 mvx/mvy/state)
    #: is kept for the spatial-direct colocated test (8.4.1.2.2)
    dpb: list[tuple] = []
    #: decoded pictures awaiting display, (poc, output) — with POC
    #: type 0 output is bumped when more than one picture pends
    pend: list[tuple] = []
    prev_poc_msb = prev_poc_lsb = 0
    decode_no = 0
    frame_no = 0

    def _bump_ready(all_of_them: bool):
        nonlocal frame_no
        depth = 0 if all_of_them else (1 if sps["poc_type"] == 0 else 0)
        while len(pend) > depth:
            pend.sort(key=lambda t: t[0])
            _poc, out = pend.pop(0)
            yield frame_no, out
            frame_no += 1

    for nal_type, nal_ref_idc, rbsp in split_annexb(buf):
        if nal_type == NAL_SPS:
            sps = parse_sps(rbsp)
        elif nal_type == NAL_PPS:
            pps = parse_pps(rbsp)
        elif nal_type in (NAL_IDR, NAL_SLICE):
            if sps is None or pps is None:
                raise ValueError("H.264 slice before SPS/PPS")
            if pps["entropy_coding_mode"]:
                raise NotImplementedError(
                    "CABAC H.264 decode needs the PyAV tier"
                )
            if sps["chroma_format_idc"] != 1:
                raise NotImplementedError("only 4:2:0 H.264 streams")
            if not sps["frame_mbs_only"]:
                # field_pic_flag would follow frame_num (7.3.3) and
                # the whole field/MBAFF machinery behind it — refuse
                # cleanly instead of misparsing the header
                raise NotImplementedError(
                    "interlaced (frame_mbs_only=0) H.264 needs the"
                    " PyAV tier"
                )
            if nal_type == NAL_IDR:
                # prior pictures all precede the new GOP in output
                # order (C.4.4): flush, then reset POC state and DPB
                yield from _bump_ready(True)
                dpb.clear()
                prev_poc_msb = prev_poc_lsb = 0
            r = _BitReader(rbsp)
            if r.ue() != 0:
                raise NotImplementedError("multi-slice H.264 pictures")
            slice_type = r.ue()
            if slice_type % 5 == 2:
                kind = "I"
            elif slice_type % 5 == 0:
                kind = "P"
                if not dpb:
                    raise ValueError(
                        "P slice before any decoded reference frame"
                    )
            elif slice_type % 5 == 1:
                kind = "B"
                if nal_ref_idc != 0:
                    # a reference B picture (B-pyramid) would enter
                    # the DPB with a list-0-only motion dict — the
                    # 8.4.1.2 list-1 colocated fallback would then be
                    # missing when it serves as the colocated picture,
                    # and the depth-1 POC bump emits a 2-layer pyramid
                    # out of display order.  Exact-or-refuse: refuse.
                    raise NotImplementedError(
                        "reference B pictures (B-pyramid) need the"
                        " PyAV tier"
                    )
                if sps["poc_type"] != 0:
                    # without explicit POC there is no display order
                    # to place a B picture's references on
                    raise NotImplementedError(
                        "B slices with POC type != 0 need the PyAV"
                        " tier"
                    )
                if pps["weighted_bipred_idc"] != 0:
                    raise NotImplementedError(
                        "weighted bi-prediction needs the PyAV tier"
                    )
                if pps["constrained_intra_pred"]:
                    raise NotImplementedError(
                        "constrained_intra_pred B slices need the"
                        " PyAV tier"
                    )
            else:
                raise NotImplementedError(
                    "SP/SI H.264 slices need the PyAV tier"
                )
            r.ue()  # pps_id
            frame_num = r.u(sps["log2_max_frame_num"])
            if nal_type == NAL_IDR:
                r.ue()  # idr_pic_id
            poc = decode_no
            if sps["poc_type"] == 0:
                # PicOrderCnt derivation 8.2.1.1 (frame coding only)
                max_lsb = 1 << sps["log2_max_poc_lsb"]
                lsb = r.u(sps["log2_max_poc_lsb"])
                if (lsb < prev_poc_lsb
                        and prev_poc_lsb - lsb >= max_lsb // 2):
                    msb = prev_poc_msb + max_lsb
                elif (lsb > prev_poc_lsb
                        and lsb - prev_poc_lsb > max_lsb // 2):
                    msb = prev_poc_msb - max_lsb
                else:
                    msb = prev_poc_msb
                poc = msb + lsb
                if nal_ref_idc != 0:
                    prev_poc_msb, prev_poc_lsb = msb, lsb
                if pps["bottom_field_pic_order"]:
                    r.se()  # delta_pic_order_cnt_bottom
            decode_no += 1
            ref_planes = ref_l1 = col_motion = pocs = None
            direct_temporal = False
            if kind == "B":
                before = [d for d in dpb if d[0] < poc]
                after = [d for d in dpb if d[0] > poc]
                if not before or not after:
                    raise ValueError(
                        "B slice without both temporal references"
                    )
                ref_b0 = max(before, key=lambda d: d[0])
                ref_b1 = min(after, key=lambda d: d[0])
                ref_planes = ref_b0[1]
                ref_l1 = ref_b1[1]
                col_motion = ref_b1[2]
                pocs = (poc, ref_b0[0], ref_b1[0])
                # direct_spatial_mv_pred_flag: 1 → spatial direct
                # (8.4.1.2.2), 0 → temporal direct (8.4.1.2.3,
                # POC-scaled colocated motion) — both native
                direct_temporal = r.u(1) == 0
                if r.u(1):  # num_ref_idx_active_override_flag
                    if r.ue() != 0 or r.ue() != 0:
                        raise NotImplementedError(
                            "multiple reference frames need the PyAV"
                            " tier"
                        )
                elif (pps["num_ref_idx_l0_default"] != 1
                        or pps["num_ref_idx_l1_default"] != 1):
                    raise NotImplementedError(
                        "multiple reference frames (PPS default) need"
                        " the PyAV tier"
                    )
                if r.u(1) or r.u(1):  # ref_pic_list_modification l0/l1
                    raise NotImplementedError(
                        "reference list modification needs the PyAV"
                        " tier"
                    )
            n_ref0 = 1
            if kind == "P":
                if pps["constrained_intra_pred"]:
                    # CIP changes intra prediction inside P slices
                    # (inter neighbours become unavailable, 8.3.1.2);
                    # our intra reconstruction assumes CIP=0
                    raise NotImplementedError(
                        "constrained_intra_pred P slices need the"
                        " PyAV tier"
                    )
                n_ref0 = pps["num_ref_idx_l0_default"]
                if r.u(1):  # num_ref_idx_active_override_flag
                    n_ref0 = r.ue() + 1  # num_ref_idx_l0_active_minus1
                if n_ref0 > len(dpb):
                    raise ValueError(
                        "num_ref_idx_l0_active exceeds the decoded"
                        " reference pictures"
                    )
                # RefPicList0 initialisation for frames (8.2.4.2.1):
                # descending PicNum = most recently decoded first
                entries = list(reversed(dpb))
                if r.u(1):  # ref_pic_list_modification_flag_l0
                    # 8.2.4.3.1 — short-term re-ordering: each op
                    # names a PicNum (abs_diff from a running
                    # prediction, MaxFrameNum wrap) and moves that
                    # picture to the next front slot
                    max_fn = 1 << sps["log2_max_frame_num"]

                    def pic_num(entry_fn: int) -> int:
                        # FrameNumWrap (8.2.4.1): decoded earlier but
                        # numerically larger frame_num wrapped down
                        return (entry_fn - max_fn
                                if entry_fn > frame_num else entry_fn)

                    pred = frame_num  # picNumL0Pred starts at CurrPicNum
                    slot = 0
                    while True:
                        idc = r.ue()
                        if idc == 3:
                            break
                        if idc not in (0, 1):
                            raise NotImplementedError(
                                "long-term reference list modification"
                                " needs the PyAV tier"
                            )
                        diff = r.ue() + 1
                        no_wrap = (pred - diff) if idc == 0 else (
                            pred + diff
                        )
                        if no_wrap < 0:
                            no_wrap += max_fn
                        elif no_wrap >= max_fn:
                            no_wrap -= max_fn
                        pred = no_wrap
                        target = (no_wrap - max_fn
                                  if no_wrap > frame_num else no_wrap)
                        hit = [i for i, d in enumerate(entries)
                               if pic_num(d[3]) == target]
                        if not hit:
                            raise ValueError(
                                "reference list modification names a"
                                " PicNum absent from the DPB"
                            )
                        if hit[0] < slot:
                            # 8.2.4.3.1 permits naming a PicNum that
                            # is already placed in the modified prefix
                            # — the spec then keeps BOTH copies (the
                            # removal step only strips copies after
                            # the insertion point), putting one
                            # picture in two RefPicList0 slots.  Our
                            # pop/insert keeps the list a permutation
                            # (wrong list), and the deblock bS rule
                            # compares ref_idx as a proxy for picture
                            # identity (8.7.2.1) which a duplicated
                            # picture would break.  Exact-or-refuse.
                            raise NotImplementedError(
                                "reference list modification that"
                                " duplicates a PicNum in the active"
                                " list needs the PyAV tier"
                            )
                        entries.insert(slot, entries.pop(hit[0]))
                        slot += 1
                ref_planes = [d[1] for d in entries][:n_ref0]
            wp = None
            if kind == "P" and pps["weighted_pred"] and n_ref0 > 1:
                raise NotImplementedError(
                    "weighted prediction with multiple references"
                    " needs the PyAV tier"
                )
            if kind == "P" and pps["weighted_pred"]:
                # pred_weight_table (7.3.3.2), single active reference:
                # explicit per-slice luma/chroma weight + offset pairs
                lwd = r.ue()   # luma_log2_weight_denom
                cwd = r.ue()   # chroma_log2_weight_denom
                wl, ol = 1 << lwd, 0
                if r.u(1):     # luma_weight_l0_flag
                    wl = r.se()
                    ol = r.se()
                wcb, ocb = 1 << cwd, 0
                wcr, ocr = 1 << cwd, 0
                if r.u(1):     # chroma_weight_l0_flag
                    wcb = r.se()
                    ocb = r.se()
                    wcr = r.se()
                    ocr = r.se()
                wp = {
                    "lwd": lwd, "wl": wl, "ol": ol,
                    "cwd": cwd, "wcb": wcb, "ocb": ocb,
                    "wcr": wcr, "ocr": ocr,
                }
            if nal_ref_idc != 0:  # dec_ref_pic_marking gated on
                # nal_ref_idc (spec 7.3.3) — a non-reference slice
                # (nal_ref_idc=0) carries no marking bits at all
                if nal_type == NAL_IDR:
                    r.u(1)
                    r.u(1)
                else:
                    if r.u(1):  # adaptive_ref_pic_marking
                        raise NotImplementedError("ref pic marking ops")
            qp = pps["pic_init_qp"] + r.se()  # slice_qp_delta
            deblock_disabled = False
            alpha_off = beta_off = 0
            if pps["deblocking_filter_control_present"]:
                idc = r.ue()  # disable_deblocking_filter_idc
                deblock_disabled = idc == 1
                if idc != 1:
                    # idc 2 only exempts slice boundaries — identical
                    # to 0 for the single-slice pictures we decode
                    alpha_off = r.se()  # slice_alpha_c0_offset_div2
                    beta_off = r.se()   # slice_beta_offset_div2
            from finanalyzer_spark.operators.h264_cavlc import (
                decode_slice,
            )

            motion_out: dict = {}
            counts: dict | None = None
            if counts_out is not None:
                # per-picture macroblock-kind census in DECODE order
                # (instrumentation for the census tests + the media
                # certification queries)
                counts = {"kind": kind}
                counts_out.append(counts)
            y, cb, cr = decode_slice(
                r, sps, pps, qp, deblock_disabled, kind, ref_planes,
                alpha_off=alpha_off, beta_off=beta_off, wp=wp,
                ref1=ref_l1, col=col_motion,
                motion_out=motion_out, counts=counts,
                direct_temporal=(kind == "B" and direct_temporal),
                pocs=pocs if kind == "B" else None,
                n_ref0=n_ref0,
            )
            if nal_ref_idc != 0:
                # only REFERENCE pictures enter the DPB (8.2.5): a
                # non-reference picture (nal_ref_idc=0) is displayed
                # but must not become a later slice's predictor
                dpb.append((
                    poc,
                    (
                        y.astype(np.int64),
                        cb.astype(np.int64),
                        cr.astype(np.int64),
                    ),
                    motion_out,
                    frame_num,
                ))
                # sliding-window marking (8.2.5.3): oldest decoded
                # reference leaves when the DPB exceeds the SPS cap
                while len(dpb) > max(1, sps["num_ref_frames"]):
                    dpb.pop(0)
            hh, ww = sps["height"], sps["width"]
            y, cb, cr = y[:hh, :ww], cb[: hh // 2, : ww // 2], cr[: hh // 2, : ww // 2]
            if yuv:
                pend.append((poc, (y, cb, cr)))
            else:
                pend.append((poc, _yuv420_to_rgb(y, cb, cr)))
            yield from _bump_ready(False)
    yield from _bump_ready(True)


def display_order_from_annexb(buf: bytes) -> list[int]:
    """Display index for every coded picture of an Annex-B stream, in
    DECODE order — a lightweight slice-header scan (SPS POC fields +
    pic_order_cnt_lsb with the 8.2.1.1 MSB-wrap derivation), no pixel
    decode.  Container muxers use this to stamp presentation times on
    B-GOP streams whose samples sit in decode order (Matroska block
    timestamps and MP4 ctts offsets are presentation, not decode,
    times).  Closed-GOP semantics: an IDR flushes (C.4.4 with
    no_output_of_prior_pics=0, the twin's behaviour), so every
    picture of GOP g displays before GOP g+1 regardless of POC reset.
    Streams without explicit POC (poc_type != 0) or with field coding
    display in decode order (identity) — the pure decode tier refuses
    B slices there anyway."""
    sps = None
    pics: list[tuple[int, int]] = []  # (gop_no, poc) in decode order
    gop = 0
    prev_msb = prev_lsb = 0
    for nal_type, nal_ref_idc, rbsp in split_annexb(buf):
        if nal_type == NAL_SPS:
            sps = parse_sps(rbsp)
        elif nal_type in (NAL_IDR, NAL_SLICE):
            if sps is None:
                raise ValueError("H.264 slice before SPS")
            if sps["poc_type"] != 0 or not sps["frame_mbs_only"]:
                # no explicit display order to recover — identity
                pics.append((0, len(pics)))
                continue
            if nal_type == NAL_IDR:
                gop += 1
                prev_msb = prev_lsb = 0
            r = _BitReader(rbsp)
            r.ue()  # first_mb_in_slice
            r.ue()  # slice_type
            r.ue()  # pps_id
            r.u(sps["log2_max_frame_num"])  # frame_num
            if nal_type == NAL_IDR:
                r.ue()  # idr_pic_id
            max_lsb = 1 << sps["log2_max_poc_lsb"]
            lsb = r.u(sps["log2_max_poc_lsb"])
            if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
                msb = prev_msb + max_lsb
            elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
                msb = prev_msb - max_lsb
            else:
                msb = prev_msb
            if nal_ref_idc != 0:
                prev_msb, prev_lsb = msb, lsb
            pics.append((gop, msb + lsb))
    order = sorted(range(len(pics)), key=lambda i: pics[i])
    disp = [0] * len(pics)
    for rank, i in enumerate(order):
        disp[i] = rank
    return disp


def build_avcc(annexb: bytes):
    """Split an Annex-B stream into (avcC_record, [length-prefixed
    coded-picture samples]) — the out-of-band parameter-set layout
    both MP4 'avc1' sample entries and Matroska CodecPrivate use
    (ISO/IEC 14496-15 §5.2.4.1).  Shared by the MP4 and MKV muxer
    twins so the record layout can never diverge between them."""
    import struct as _s

    sps_nal = pps_nal = None
    samples = []
    for nal_type, ref, rbsp in split_annexb(annexb):
        nal = bytes([(ref << 5) | nal_type]) + _escape(rbsp)
        if nal_type == NAL_SPS:
            sps_nal = nal
        elif nal_type == NAL_PPS:
            pps_nal = nal
        elif nal_type in (NAL_IDR, NAL_SLICE):
            samples.append(_s.pack(">I", len(nal)) + nal)
    if sps_nal is None or pps_nal is None:
        raise ValueError("Annex-B stream without SPS/PPS")
    avcc = (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
        + _s.pack(">H", len(sps_nal)) + sps_nal
        + bytes([1])
        + _s.pack(">H", len(pps_nal)) + pps_nal
    )
    return avcc, samples


def annexb_from_avcc(cfg: dict, samples) -> bytes:
    """Rebuild an Annex-B stream from a parsed avcC config (SPS/PPS
    NAL units + nal_length_size) and an iterable of length-prefixed
    coded samples — the shared core of mp4_avc_to_annexb /
    mkv_avc_to_annexb."""
    out = bytearray()
    for nal in cfg["sps"] + cfg["pps"]:
        out += b"\x00\x00\x00\x01" + nal
    nls = cfg["nal_length_size"]
    for sample in samples:
        pos = 0
        while pos + nls <= len(sample):
            ln = int.from_bytes(sample[pos : pos + nls], "big")
            pos += nls
            out += b"\x00\x00\x00\x01" + sample[pos : pos + ln]
            pos += ln
    return bytes(out)
