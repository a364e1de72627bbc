"""Pure-python H.264 inter-prediction core: motion compensation + MV
prediction for P slices.

Round 7's second codec step: with operators/h264_cavlc providing the
entropy layer and intra reconstruction, this module adds what
motion-compensated video needs — quarter-pel luma interpolation (the
6-tap [1,-5,20,20,-5,1] half-pel filter + quarter-pel averaging, spec
8.4.2.2), eighth-pel bilinear chroma interpolation, median motion
vector prediction incl. the P_Skip rule (8.4.1), and the INTER column
of the coded_block_pattern me(v) mapping (Table 9-4).  The slice
layer that consumes these lives in h264_cavlc.decode_slice (P
macroblock parse/reconstruct) and the GOP encoder twin
`encode_h264_video` below.

Tier contract (exact-or-refuse, same as the intra tier): the decoder
handles EVERY P macroblock partition shape over one or more
references (per-partition te(v) ref_idx, refIdx-aware same-reference
rules in the 8.4.1.3 predictors, P_8x8ref0) —
P_L0_16x16, the two-partition shapes P_L0_L0_16x8 / 8x16
(directional MV prediction per 8.4.1.3 over the 4x4-granularity
MvField), P_8x8 sub-partitions down to 4x4 (median prediction per
sub-partition), P_Skip, and intra macroblocks — with explicit
weighted prediction (8.4.2.3) when the PPS enables it.  B slices
decode with EVERY Table 7-14/7-18 shape: B_Skip and B_Direct_16x16
through spatial direct mode (8.4.1.2.2, incl. the colocated-motion
zero rule over the stored list-1 reference motion field and
B_Direct_8x8), B_L0/L1/Bi at 16x16, both two-partition geometries
in every list combination, and B_8x8 sub-partitions down to 4x4 —
per-list median prediction and default bi-prediction averaging
(8.4.2.3.1), both direct derivations (spatial 8.4.1.2.2 / temporal
8.4.1.2.3), POC-ordered display output, and §8.7 deblocking with
the two-list boundary-strength rule.  Long-term references,
multi-reference B slices and CABAC raise NotImplementedError naming
the PyAV tier.

Validation strategy (tests/test_h264_inter.py):
* the 6-tap half-pel filter is pinned against hand-computed vectors;
* quarter-pel positions are pinned against their defining averages
  computed independently in the test;
* decode == encoder-reconstruction bit-for-bit across QPs / motion
  patterns (closed loop through the same MC path);
* a translating scene must code dramatically smaller as P than as
  intra, and a static scene must collapse to P_Skip runs.

Spec grounding: ITU-T H.264 (08/2021) §7.3.5 / §7.4.5 (P macroblock
types), §8.4.1 (MV prediction), §8.4.2.2 (fractional sample
interpolation), Table 9-4 (me(v) inter column).  Reference context:
the reference repo has no media surface — extended tier.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Table 9-4: codeNum → coded_block_pattern, Inter column, codeNum order.
# ---------------------------------------------------------------------------
CBP_INTER_FROM_CODENUM = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
]
CODENUM_FROM_CBP_INTER = {
    cbp: n for n, cbp in enumerate(CBP_INTER_FROM_CODENUM)
}

#: P-slice mb_type values (Table 7-13); >= 5 means intra (subtract 5)
P_L0_16x16 = 0
P_INTRA_OFFSET = 5
#: every P partition shape of Table 7-13/7-17 decodes natively since
#: round 7 (16x16, 16x8, 8x16, and the P_8x8 sub-partitions down to
#: 4x4); the remaining inter refusals are stream-level (CABAC,
#: multi-ref, weighted prediction, B slices)


def _np():
    import numpy as np

    return np


# ---------------------------------------------------------------------------
# Fractional-sample interpolation (8.4.2.2)
# ---------------------------------------------------------------------------
def _six_tap(a, b, c, d, e, f):
    """The half-sample FIR (8.4.2.2.1): 1 -5 20 20 -5 1, unnormalised."""
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


class PaddedPlane:
    """Edge-padded int64 copy of a reference plane (r13, guide §4.2).

    The spec's out-of-bounds rule is coordinate clamping; edge
    replication of `pad` samples reproduces it exactly for any window
    that stays within the padding, so mc_luma / mc_chroma /
    _motion_search can use basic slicing (no per-call np.clip +
    np.arange + fancy-index gather, the dominant per-block cost at
    this frame size). Windows that exceed the padding fall back to
    the original clamped-gather path via `.base`. Build one per
    reference plane per slice-encode; every sample read off it is
    bit-identical to reading the raw plane."""

    __slots__ = ("arr", "base", "pad", "shape")

    def __init__(self, ref, pad: int = 24):
        np = _np()
        self.base = ref
        self.pad = pad
        self.shape = ref.shape
        self.arr = np.pad(ref, pad, mode="edge").astype(np.int64)


def _wrap_refs(ref):
    """(y, cb, cr) triple (or list of triples) → PaddedPlane triple(s);
    idempotent."""
    if isinstance(ref, list):
        return [_wrap_refs(r) for r in ref]
    if isinstance(ref[0], PaddedPlane):
        return ref
    return tuple(PaddedPlane(p) for p in ref)


def mc_luma(ref, px: int, py: int, mvx: int, mvy: int, bh: int = 16,
            bw: int = 16):
    """Motion-compensated luma block: `ref` is the full reference
    plane; (px, py) the block's top-left in the current picture;
    (mvx, mvy) the motion vector in QUARTER-pel units.  Out-of-bounds
    reference samples are edge-clamped (the spec's coordinate Clip3).
    Returns an int64 (bh, bw) block of clipped [0, 255] samples."""
    np = _np()
    pp = None
    if isinstance(ref, PaddedPlane):
        pp, ref = ref, ref.base
    h, w = ref.shape
    x0, y0 = px + (mvx >> 2), py + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    if fx == 0 and fy == 0:
        # full-pel: no taps needed — gather just the block (r13 fast
        # path; basic slicing when in-bounds, clamped gather otherwise)
        if pp is not None and -pp.pad <= y0 and -pp.pad <= x0 and \
                y0 + bh <= h + pp.pad and x0 + bw <= w + pp.pad:
            q = pp.pad
            return pp.arr[q + y0 : q + y0 + bh,
                          q + x0 : q + x0 + bw].copy()
        if 0 <= y0 and 0 <= x0 and y0 + bh <= h and x0 + bw <= w:
            return ref[y0 : y0 + bh, x0 : x0 + bw].astype(np.int64)
        ys = np.clip(np.arange(y0, y0 + bh), 0, h - 1)
        xs = np.clip(np.arange(x0, x0 + bw), 0, w - 1)
        return ref[np.ix_(ys, xs)].astype(np.int64)
    # padded full-pel window: rows y0-2 .. y0+bh+3, cols x0-2 ..
    # x0+bw+3 — two taps left/above, three taps plus one half-pel
    # shift right/below (the dy/dx = 1 variants s and m)
    if pp is not None and y0 - 2 >= -pp.pad and x0 - 2 >= -pp.pad and \
            y0 + bh + 4 <= h + pp.pad and x0 + bw + 4 <= w + pp.pad:
        q = pp.pad
        win = pp.arr[q + y0 - 2 : q + y0 + bh + 4,
                     q + x0 - 2 : q + x0 + bw + 4]
    elif y0 >= 2 and x0 >= 2 and y0 + bh + 4 <= h and x0 + bw + 4 <= w:
        # in-bounds: basic slicing instead of the clamped fancy gather
        win = ref[y0 - 2 : y0 + bh + 4, x0 - 2 : x0 + bw + 4].astype(
            np.int64
        )
    else:
        ys = np.clip(np.arange(y0 - 2, y0 + bh + 4), 0, h - 1)
        xs = np.clip(np.arange(x0 - 2, x0 + bw + 4), 0, w - 1)
        win = ref[np.ix_(ys, xs)].astype(np.int64)  # (bh+6, bw+6)

    def full(dy, dx):  # full-pel grid shifted by (dy, dx) in {0, 1}
        return win[2 + dy : 2 + dy + bh, 2 + dx : 2 + dx + bw]

    # horizontal half-pel intermediates b1 at every row of the padded
    # window (kept unnormalised — j needs them raw); b1[r, c]
    # interpolates between padded-window columns c+2 and c+3
    b1 = _six_tap(
        win[:, 0 : bw + 1], win[:, 1 : bw + 2], win[:, 2 : bw + 3],
        win[:, 3 : bw + 4], win[:, 4 : bw + 5], win[:, 5 : bw + 6],
    )  # (bh+6, bw+1)
    # vertical half-pel intermediates h1 at every column
    h1 = _six_tap(
        win[0 : bh + 1, :], win[1 : bh + 2, :], win[2 : bh + 3, :],
        win[3 : bh + 4, :], win[4 : bh + 5, :], win[5 : bh + 6, :],
    )  # (bh+1, bw+6)

    def clip8(x):
        return np.minimum(np.maximum(x, 0), 255)

    def b_half(dy, dx):  # clipped horizontal half-pel at row shift dy,
        # between full-pel columns (dx, dx+1)
        return clip8((b1[2 + dy : 2 + dy + bh, dx : dx + bw] + 16) >> 5)

    def h_half(dy, dx):  # clipped vertical half-pel at column shift dx
        return clip8((h1[dy : dy + bh, 2 + dx : 2 + dx + bw] + 16) >> 5)

    if fy == 0:  # row of full-pel: G a b c
        b = b_half(0, 0)
        if fx == 1:
            return (full(0, 0) + b + 1) >> 1
        if fx == 2:
            return b
        return (full(0, 1) + b + 1) >> 1
    if fx == 0:  # column: G d h n
        hh = h_half(0, 0)
        if fy == 1:
            return (full(0, 0) + hh + 1) >> 1
        if fy == 2:
            return hh
        return (full(1, 0) + hh + 1) >> 1

    # centre family needs j: vertical 6-tap over the UNNORMALISED b1
    # intermediates (8.4.2.2.1's two-stage path), then (j1+512)>>10
    def j_half(dx):  # centre half-pel between columns (dx, dx+1)
        j1 = _six_tap(
            b1[0 : bh, dx : dx + bw], b1[1 : bh + 1, dx : dx + bw],
            b1[2 : bh + 2, dx : dx + bw], b1[3 : bh + 3, dx : dx + bw],
            b1[4 : bh + 4, dx : dx + bw], b1[5 : bh + 5, dx : dx + bw],
        )
        return clip8((j1 + 512) >> 10)

    j = j_half(0)
    if fx == 2 and fy == 2:
        return j
    if fx == 2:  # f (fy=1) / q (fy=3): average j with b above/below
        b = b_half(0, 0) if fy == 1 else b_half(1, 0)
        return (b + j + 1) >> 1
    if fy == 2:  # i (fx=1) / k (fx=3): average j with h left/right
        hh = h_half(0, 0) if fx == 1 else h_half(0, 1)
        return (hh + j + 1) >> 1
    # corner quarter-pels e/g/p/r: average the adjacent b and h
    b = b_half(0, 0) if fy == 1 else b_half(1, 0)
    hh = h_half(0, 0) if fx == 1 else h_half(0, 1)
    return (b + hh + 1) >> 1


def mc_chroma(ref, px: int, py: int, mvx: int, mvy: int, bh: int = 8,
              bw: int = 8):
    """Motion-compensated chroma block (8.4.2.2.2): `ref` is the
    chroma reference plane, (px, py) the block's top-left in CHROMA
    coordinates, (mvx, mvy) the LUMA motion vector in quarter-pel
    units (eighth-pel in chroma).  Bilinear interpolation with
    edge-clamped sampling."""
    np = _np()
    pp = None
    if isinstance(ref, PaddedPlane):
        pp, ref = ref, ref.base
    h, w = ref.shape
    x0, y0 = px + (mvx >> 3), py + (mvy >> 3)
    dx, dy = mvx & 7, mvy & 7
    if dx == 0 and dy == 0:
        # integer chroma position: (64*a + 32) >> 6 == a — gather just
        # the block (r13 fast path)
        if pp is not None and -pp.pad <= y0 and -pp.pad <= x0 and \
                y0 + bh <= h + pp.pad and x0 + bw <= w + pp.pad:
            q = pp.pad
            return pp.arr[q + y0 : q + y0 + bh,
                          q + x0 : q + x0 + bw].copy()
        if 0 <= y0 and 0 <= x0 and y0 + bh <= h and x0 + bw <= w:
            return ref[y0 : y0 + bh, x0 : x0 + bw].astype(np.int64)
        ys = np.clip(np.arange(y0, y0 + bh), 0, h - 1)
        xs = np.clip(np.arange(x0, x0 + bw), 0, w - 1)
        return ref[np.ix_(ys, xs)].astype(np.int64)
    if pp is not None and -pp.pad <= y0 and -pp.pad <= x0 and \
            y0 + bh + 1 <= h + pp.pad and x0 + bw + 1 <= w + pp.pad:
        q = pp.pad
        win = pp.arr[q + y0 : q + y0 + bh + 1, q + x0 : q + x0 + bw + 1]
    elif 0 <= y0 and 0 <= x0 and y0 + bh + 1 <= h and x0 + bw + 1 <= w:
        win = ref[y0 : y0 + bh + 1, x0 : x0 + bw + 1].astype(np.int64)
    else:
        ys = np.clip(np.arange(y0, y0 + bh + 1), 0, h - 1)
        xs = np.clip(np.arange(x0, x0 + bw + 1), 0, w - 1)
        win = ref[np.ix_(ys, xs)].astype(np.int64)
    a = win[0:bh, 0:bw]
    b = win[0:bh, 1 : bw + 1]
    c = win[1 : bh + 1, 0:bw]
    d = win[1 : bh + 1, 1 : bw + 1]
    if dy == 0:
        return ((8 - dx) * 8 * a + dx * 8 * b + 32) >> 6
    if dx == 0:
        return ((8 - dy) * 8 * a + dy * 8 * c + 32) >> 6
    return (
        (8 - dx) * (8 - dy) * a
        + dx * (8 - dy) * b
        + (8 - dx) * dy * c
        + dx * dy * d
        + 32
    ) >> 6


def wp_apply(pred, w: int, o: int, lwd: int):
    """Explicit weighted prediction (8.4.2.3.2, unidirectional):
    pred' = Clip1(((pred * w + 2^(lwd-1)) >> lwd) + o) for lwd >= 1,
    Clip1(pred * w + o) for lwd == 0.  numpy's int64 >> is the spec's
    arithmetic shift, so negative weights behave per the standard."""
    np = _np()
    p = pred * w
    if lwd >= 1:
        p = (p + (1 << (lwd - 1))) >> lwd
    return np.clip(p + o, 0, 255)


# ---------------------------------------------------------------------------
# Motion vector prediction (8.4.1.3) at 4x4-block granularity — the
# spec's neighbour contexts A/B/C/D are 4x4 luma blocks, which is what
# makes the 16x8 / 8x16 partition predictors well-defined
# ---------------------------------------------------------------------------
class MvField:
    """4x4-granularity motion state for one picture: per-block state
    (0 = unset/not-yet-decoded, 1 = intra, 2 = inter) plus quarter-pel
    motion vectors for inter blocks.  Availability in the 8.4.1.3.2
    sense (inside the picture AND already decoded) is `state != 0` —
    blocks of macroblocks after the current one in decode order are
    still 0 when neighbours are probed.

    `override` (a {(gx, gy): (mvx, mvy)} dict) lets an encoder probe
    a candidate partitioning before committing it — partition 1's
    predictor depends on partition 0's decided MV."""

    UNSET, INTRA, INTER = 0, 1, 2

    def __init__(self, mbw: int, mbh: int):
        np = _np()
        self.w, self.h = mbw * 4, mbh * 4
        self.state = np.zeros((self.h, self.w), dtype=np.uint8)
        self.mvx = np.zeros((self.h, self.w), dtype=np.int64)
        self.mvy = np.zeros((self.h, self.w), dtype=np.int64)
        #: reference index per block (-1 = intra/unset; multi-ref P
        #: streams make the 8.4.1.3 same-reference tests real)
        self.ref = np.full((self.h, self.w), -1, dtype=np.int64)

    def put_inter(self, gy: int, gx: int, h4: int, w4: int, mv,
                  ref_idx: int = 0) -> None:
        self.state[gy : gy + h4, gx : gx + w4] = self.INTER
        self.mvx[gy : gy + h4, gx : gx + w4] = mv[0]
        self.mvy[gy : gy + h4, gx : gx + w4] = mv[1]
        self.ref[gy : gy + h4, gx : gx + w4] = ref_idx

    def put_intra(self, gy: int, gx: int, h4: int, w4: int) -> None:
        self.state[gy : gy + h4, gx : gx + w4] = self.INTRA
        self.mvx[gy : gy + h4, gx : gx + w4] = 0
        self.mvy[gy : gy + h4, gx : gx + w4] = 0
        self.ref[gy : gy + h4, gx : gx + w4] = -1

    def avail(self, gx: int, gy: int, override=None) -> bool:
        if gx < 0 or gy < 0 or gx >= self.w or gy >= self.h:
            return False
        if override and (gx, gy) in override:
            return True
        return self.state[gy, gx] != self.UNSET

    def _override_entry(self, override, gx, gy):
        """Normalize an override value to (mv, ref_idx): encoder
        probes store either a bare (mvx, mvy) (ref 0) or
        ((mvx, mvy), ref_idx)."""
        v = override[(gx, gy)]
        if isinstance(v[0], tuple):
            return v
        return v, 0

    def inter_mv(self, gx: int, gy: int, override=None):
        """(mvx, mvy) when the block is available AND inter, else
        None (unavailable and intra both contribute (0, 0) to the
        median and never satisfy the same-reference tests)."""
        if gx < 0 or gy < 0 or gx >= self.w or gy >= self.h:
            return None
        if override and (gx, gy) in override:
            return self._override_entry(override, gx, gy)[0]
        if self.state[gy, gx] != self.INTER:
            return None
        return int(self.mvx[gy, gx]), int(self.mvy[gy, gx])

    def ref_of(self, gx: int, gy: int, override=None) -> int:
        """The block's reference index, -1 when unavailable/intra."""
        if gx < 0 or gy < 0 or gx >= self.w or gy >= self.h:
            return -1
        if override and (gx, gy) in override:
            return self._override_entry(override, gx, gy)[1]
        if self.state[gy, gx] != self.INTER:
            return -1
        return int(self.ref[gy, gx])


def predict_mv_part(
    field: MvField,
    gx: int,
    gy: int,
    w4: int,
    directional: str | None = None,
    override=None,
    ref_idx: int = 0,
):
    """MV predictor for a partition with top-left 4x4 block (gx, gy)
    and width `w4` blocks (8.4.1.3).  `directional` names the
    single-neighbour rule of the non-square partitions — 'B' (16x8
    top), 'A' (16x8 bottom / 8x16 left), 'C' (8x16 right) — applied
    when that neighbour predicts from the SAME reference index, else
    the median process of 8.4.1.3.1 with C→D substitution.  With one
    active reference every inter neighbour matches `ref_idx` 0, which
    reduces to the single-reference rules; multi-reference P streams
    make the same-reference tests discriminate."""
    a_av = field.avail(gx - 1, gy, override)
    a = field.inter_mv(gx - 1, gy, override)
    a_ref = field.ref_of(gx - 1, gy, override)
    b_av = field.avail(gx, gy - 1, override)
    b = field.inter_mv(gx, gy - 1, override)
    b_ref = field.ref_of(gx, gy - 1, override)
    c_av = field.avail(gx + w4, gy - 1, override)
    c = field.inter_mv(gx + w4, gy - 1, override)
    c_ref = field.ref_of(gx + w4, gy - 1, override)
    if not c_av:
        c_av = field.avail(gx - 1, gy - 1, override)
        c = field.inter_mv(gx - 1, gy - 1, override)
        c_ref = field.ref_of(gx - 1, gy - 1, override)
    if directional == "A" and a is not None and a_ref == ref_idx:
        return a
    if directional == "B" and b is not None and b_ref == ref_idx:
        return b
    if directional == "C" and c is not None and c_ref == ref_idx:
        return c
    # 8.4.1.3.1: B, C (and D) all unavailable → predictor is A
    if not b_av and not c_av and a_av:
        return a if a is not None else (0, 0)
    cands = [(a, a_ref), (b, b_ref), (c, c_ref)]
    same = [m for m, r in cands if m is not None and r == ref_idx]
    if len(same) == 1:  # exactly one same-reference neighbour
        return same[0]
    vals = [m if m is not None else (0, 0) for m, _r in cands]
    xs = sorted(v[0] for v in vals)
    ys = sorted(v[1] for v in vals)
    return xs[1], ys[1]


def predict_mv(field: MvField, mx: int, my: int):
    """Median MV predictor for a whole-macroblock 16x16 partition."""
    return predict_mv_part(field, mx * 4, my * 4, 4)


def skip_mv(field: MvField, mx: int, my: int):
    """P_Skip motion vector (8.4.1.1): zero when the left or above
    neighbour block is unavailable, or when either is inter on
    reference 0 with a zero MV; otherwise the median predictor at
    refIdxL0 = 0."""
    gx, gy = mx * 4, my * 4
    if not field.avail(gx - 1, gy) or not field.avail(gx, gy - 1):
        return 0, 0
    a = field.inter_mv(gx - 1, gy)
    b = field.inter_mv(gx, gy - 1)
    if (a == (0, 0) and field.ref_of(gx - 1, gy) == 0) or (
        b == (0, 0) and field.ref_of(gx, gy - 1) == 0
    ):
        return 0, 0
    return predict_mv(field, mx, my)


# ---------------------------------------------------------------------------
# B slices: default bi-prediction + spatial direct mode
# ---------------------------------------------------------------------------
#: B-slice intra mb_type offset (Table 7-14: mb_type >= 23 is intra)
B_INTRA_OFFSET = 23


def bi_average(p0, p1):
    """Default (weighted_bipred_idc == 0) bi-prediction, 8.4.2.3.1:
    the rounded average of the two interpolated prediction signals."""
    return (p0 + p1 + 1) >> 1


def _direct_uses_list(field: MvField, gx: int, gy: int) -> bool:
    """refIdxLX = MinPositive over neighbours A/B/C (C→D fallback,
    8.4.1.3.2) — with one reference per list this collapses to 'does
    ANY neighbour predict from list X' (8.4.1.2.2 step 1)."""
    a = field.inter_mv(gx - 1, gy)
    b = field.inter_mv(gx, gy - 1)
    if field.avail(gx + 4, gy - 1):
        c = field.inter_mv(gx + 4, gy - 1)
    else:
        c = field.inter_mv(gx - 1, gy - 1)
    return a is not None or b is not None or c is not None


def spatial_direct(f0: MvField, f1: MvField, col: dict,
                   mx: int, my: int, inference8x8: bool):
    """Spatial direct motion derivation (8.4.1.2.2) for one B
    macroblock — B_Skip and B_Direct_16x16 both route through here.

    `col` is the colocated picture's stored 4x4 motion (RefPicList1[0]
    — always short-term in this tier): dict with "state"/"mvx"/"mvy"
    arrays as decode_h264_annexb retains per reference picture.

    Returns (use0, use1, mv0, mv1): per-list participation flags and
    4x4 lists of quarter-pel MVs per 4x4 block.  Derivation: each
    list's refIdx is the MinPositive over the MB neighbours (single
    reference → a used/unused flag); both unused → zero prediction on
    BOTH lists (directZeroPredictionFlag); otherwise the list MV is
    the 8.4.1.3 median predictor, zeroed per 4x4 block where the
    colocated block is inter on reference 0 with |mv| <= 1 quarter-pel
    in both components (the colZeroFlag still-background rule).  With
    `inference8x8` (SPS direct_8x8_inference_flag) colocated motion is
    sampled at the 8x8 quadrant's outer-corner 4x4 block, so MVs are
    constant per quadrant."""
    gx, gy = mx * 4, my * 4
    use0 = _direct_uses_list(f0, gx, gy)
    use1 = _direct_uses_list(f1, gx, gy)
    zero = [[(0, 0)] * 4 for _ in range(4)]
    if not use0 and not use1:
        # directZeroPredictionFlag: both lists, all-zero motion
        return True, True, zero, zero
    mvp0 = predict_mv(f0, mx, my) if use0 else (0, 0)
    mvp1 = predict_mv(f1, mx, my) if use1 else (0, 0)
    mv0 = [[mvp0] * 4 for _ in range(4)]
    mv1 = [[mvp1] * 4 for _ in range(4)]
    for by in range(4):
        for bx in range(4):
            if inference8x8:
                # corner 4x4 of the 8x8 quadrant (8.4.1.2.2 via
                # direct_8x8_inference): outermost block of the MB
                cx, cy = (0 if bx < 2 else 3), (0 if by < 2 else 3)
            else:
                cx, cy = bx, by
            col_ref = col.get("ref")
            col_zero = (
                col["state"][gy + cy, gx + cx] == MvField.INTER
                and (col_ref is None
                     or int(col_ref[gy + cy, gx + cx]) == 0)
                and abs(int(col["mvx"][gy + cy, gx + cx])) <= 1
                and abs(int(col["mvy"][gy + cy, gx + cx])) <= 1
            )
            if col_zero:
                if use0:
                    mv0[by][bx] = (0, 0)
                if use1:
                    mv1[by][bx] = (0, 0)
    return use0, use1, mv0, mv1


def temporal_direct(col: dict, pocs, mx: int, my: int,
                    inference8x8: bool):
    """Temporal direct motion derivation (8.4.1.2.3) for one B
    macroblock: scale the colocated list-0 motion by the picture-
    order-count distances.  `pocs` = (poc_cur, poc_l0, poc_l1).
    Both lists always participate (refIdx 0 each); per 4x4 block,
    mvL0 = (DistScaleFactor * mvCol + 128) >> 8 and
    mvL1 = mvL0 - mvCol, with mvCol = 0 for intra colocated blocks.
    Returns the same (use0, use1, mv0, mv1) shape as
    spatial_direct."""
    poc_cur, poc_l0, poc_l1 = pocs

    def clip3(lo, hi, v):
        return lo if v < lo else hi if v > hi else v

    td = clip3(-128, 127, poc_l1 - poc_l0)
    tb = clip3(-128, 127, poc_cur - poc_l0)
    if td == 0:
        dsf = None  # degenerate: mvL0 = mvCol, mvL1 = 0 (8.4.1.2.3)
    else:
        # integer division truncating toward zero (spec "/" on ints)
        num = 16384 + abs(td) // 2
        tx = num // td if td > 0 else -(num // -td)
        dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    gx, gy = mx * 4, my * 4
    mv0 = [[(0, 0)] * 4 for _ in range(4)]
    mv1 = [[(0, 0)] * 4 for _ in range(4)]
    for by in range(4):
        for bx in range(4):
            if inference8x8:
                cx, cy = (0 if bx < 2 else 3), (0 if by < 2 else 3)
            else:
                cx, cy = bx, by
            if col["state"][gy + cy, gx + cx] == MvField.INTER:
                col_ref = col.get("ref")
                if col_ref is not None and int(
                    col_ref[gy + cy, gx + cx]
                ) > 0:
                    # MapColToList0 of a ref > 0 lands outside this
                    # tier's single active list-0 reference
                    raise NotImplementedError(
                        "temporal direct over a multi-reference"
                        " colocated picture needs the PyAV tier"
                    )
                mvc = (
                    int(col["mvx"][gy + cy, gx + cx]),
                    int(col["mvy"][gy + cy, gx + cx]),
                )
            else:
                mvc = (0, 0)  # intra colocated → zero motion
            if dsf is None:
                l0 = mvc
                l1 = (0, 0)
            else:
                l0 = (
                    (dsf * mvc[0] + 128) >> 8,
                    (dsf * mvc[1] + 128) >> 8,
                )
                l1 = (l0[0] - mvc[0], l0[1] - mvc[1])
            mv0[by][bx] = l0
            mv1[by][bx] = l1
    return True, True, mv0, mv1


# ---------------------------------------------------------------------------
# GOP encoder twin (IDR + P frames)
# ---------------------------------------------------------------------------
def _motion_search(ref_y, src_mb, px: int, py: int, mvp,
                   search_range: int, bh: int = 16, bw: int = 16):
    """Best-SAD motion estimation for one (bh, bw) block: full-pel
    search in a ±search_range window around the predictor, then two
    sub-pel refinement rounds (half, then quarter) through the exact
    interpolation path the decoder runs.  Cost = SAD + |mvd| (a tiny
    rate term that also makes ties deterministic toward the
    predictor).  Returns (mvx, mvy) in quarter-pel units."""
    np = _np()

    def cost(mvx, mvy):
        pred = mc_luma(ref_y, px, py, mvx, mvy, bh=bh, bw=bw)
        return int(np.abs(pred - src_mb).sum()) + abs(mvx - mvp[0]) + abs(
            mvy - mvp[1]
        )

    # full-pel raster search around the rounded predictor — one
    # vectorised SAD scan over a sliding window (edge-clamped gather,
    # identical samples to mc_luma's integer path); ties resolve to
    # the centre first, then raster order, exactly like the scalar
    # loop this replaces
    cx, cy = (mvp[0] + 2) >> 2 << 2, (mvp[1] + 2) >> 2 << 2
    R = search_range
    h, w = ref_y.shape
    y0, x0 = py + (cy >> 2) - R, px + (cx >> 2) - R
    if isinstance(ref_y, PaddedPlane) and y0 >= -ref_y.pad and \
            x0 >= -ref_y.pad and y0 + bh + 2 * R <= h + ref_y.pad and \
            x0 + bw + 2 * R <= w + ref_y.pad:
        q = ref_y.pad
        win = ref_y.arr[q + y0 : q + y0 + bh + 2 * R,
                        q + x0 : q + x0 + bw + 2 * R]
    else:
        base = ref_y.base if isinstance(ref_y, PaddedPlane) else ref_y
        ys = np.clip(np.arange(y0, y0 + bh + 2 * R), 0, h - 1)
        xs = np.clip(np.arange(x0, x0 + bw + 2 * R), 0, w - 1)
        win = base[np.ix_(ys, xs)]
    sw = np.lib.stride_tricks.sliding_window_view(win, (bh, bw))
    sad = np.abs(
        sw.astype(np.int64) - src_mb[None, None]
    ).sum(axis=(2, 3))
    dxs = cx + 4 * (np.arange(2 * R + 1) - R)
    dys = cy + 4 * (np.arange(2 * R + 1) - R)
    costs = (
        sad
        + np.abs(dxs - mvp[0])[None, :]
        + np.abs(dys - mvp[1])[:, None]
    )
    order = [(R, R)] + [
        (j, i)
        for j in range(2 * R + 1)
        for i in range(2 * R + 1)
        if (j, i) != (R, R)
    ]
    bj, bi = min(order, key=lambda ji: int(costs[ji[0], ji[1]]))
    best = (int(costs[bj, bi]), int(dxs[bi]), int(dys[bj]))
    if int(sad[bj, bi]) == 0:
        # perfect full-pel match: sub-pel positions can only add
        # distortion (early exit, the standard encoder shortcut)
        return best[1], best[2]
    # sub-pel refinement: half then quarter
    for step in (2, 1):
        _c, bx, by = best
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                c = cost(bx + dx, by + dy)
                if c < best[0]:
                    best = (c, bx + dx, by + dy)
    return best[1], best[2]




def _bits_of(wr) -> int:
    return 8 * len(wr.out) + wr.nbits


def _append_bits(dst, src_w) -> None:
    """Replay one writer's bits into another (probe commit)."""
    for byte in src_w.out:
        dst.u(byte, 8)
    if src_w.nbits:
        dst.u(src_w.acc & ((1 << src_w.nbits) - 1), src_w.nbits)


def _quant_luma_mb(src_mb, pred, qp: int):
    """16 per-4x4 quantised level lists + cbp_luma (batched whole-MB
    transform + quant — bit-identical to the per-block loop)."""
    from finanalyzer_spark.operators.h264_cavlc import (
        forward_transform_4x4_batch,
        mb_to_blocks,
        quant_4x4_batch,
    )

    resid = src_mb - pred
    wt = forward_transform_4x4_batch(mb_to_blocks(resid))
    lv = quant_4x4_batch(wt, qp)
    cbp = 0
    for q in range(4):
        if any(any(lv[b]) for b in range(q * 4, q * 4 + 4)):
            cbp |= 1 << q
    return lv, cbp


def _recon_luma_mb(pred, lv, cbp_luma: int, qp: int):
    import numpy as np

    from finanalyzer_spark.operators.h264_cavlc import (
        blocks_to_mb,
        dequant_4x4_batch,
        inverse_transform_4x4_batch,
        mb_to_blocks,
    )

    if cbp_luma:
        res = inverse_transform_4x4_batch(dequant_4x4_batch(lv, qp))
        # non-coded 8x8 quadrants reconstruct from prediction alone
        for blk in range(16):
            if not cbp_luma & (1 << (blk >> 2)):
                res[blk] = 0
        out = mb_to_blocks(np.asarray(pred)) + res
        return np.minimum(np.maximum(blocks_to_mb(out), 0), 255)
    return np.minimum(np.maximum(np.asarray(pred), 0), 255).astype(
        np.int64
    )


def _encode_p_slice_mbs(s, est, src, ref, qp, qpc, mbw, mbh,
                        search_range, wp, n_ref0: int = 1):
    """RD macroblock loop of one P slice: for every macroblock,
    probe P_Skip / P_L0_16x16 / the partition shapes / intra
    fallback through the decoder's exact reconstruction path and
    emit the cheapest (SSD + lambda*bits).  Extracted from
    encode_h264_video so the B-GOP twin encodes its P reference
    frames through the identical closed loop.  Writes slice-data
    bits into `s` and the reconstruction + motion state into
    `est`; the caller owns the slice header and NAL wrapping.

    `ref` is a (y, cb, cr) triple or the RefPicList0 list of them
    (most recent first); with `n_ref0` > 1 the 16x16 candidate is
    searched on EVERY active reference (ref_idx te(v) priced into
    the RD bits), partition shapes stay on reference 0, and the
    8x8 shape is emitted as P_8x8ref0."""
    import numpy as np

    from finanalyzer_spark.operators.h264 import _BitWriter
    from finanalyzer_spark.operators.h264_cavlc import (
        _blk_xy,
        _encode_intra_mb,
        _nc_from_grid,
        _quant_chroma_resid,
        _write_chroma_residual,
        dequant_4x4,
        encode_residual_block,
        forward_transform_4x4,
        inverse_transform_4x4,
        quant_4x4,
    )

    src_y, src_cb, src_cr = src
    refs0 = ref if isinstance(ref, list) else [ref]
    # one edge-padded copy per reference plane: every MC / motion-
    # search window in this slice reads it via basic slicing (r13)
    refs0 = [_wrap_refs(r) for r in refs0]
    ref = refs0[0]

    #: JM-style rate-distortion lambda for the SSD + lam*bits cost
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)

    skip_run = 0
    for mb in range(mbw * mbh):
        my, mx = divmod(mb, mbw)
        px, py = mx * 16, my * 16
        cx, cy = mx * 8, my * 8
        src_mb = src_y[py : py + 16, px : px + 16]
        src_cb_mb = src_cb[cy : cy + 8, cx : cx + 8]
        src_cr_mb = src_cr[cy : cy + 8, cx : cx + 8]

        def write_inter(wr, mbt, mvpairs, lv_, cbpl, cbpc,
                        cdc_, cac_, tc_y, tc_c, ridxs=None):
            """mb_type (+ sub_mb_types for P_8x8) + ref_idx te(v)
            codes when several references are active + per-partition
            mvds + CBP + shared CAVLC residual (7.3.5) — one
            writer for 16x16/16x8/8x16/8x8."""
            wr.ue(mbt)
            if mbt in (3, 4):  # P_8x8(ref0): four sub_mb_type codes
                for _ in range(4):
                    wr.ue(0)  # P_L0_8x8 sub-blocks
            if n_ref0 > 1 and mbt != 4:
                for ri in ridxs or [0] * len(mvpairs):
                    if n_ref0 == 2:
                        wr.u(1 - ri, 1)  # te(v), cmax 1
                    else:
                        wr.ue(ri)
            for pmvp, pmv in mvpairs:
                wr.se(pmv[0] - pmvp[0])
                wr.se(pmv[1] - pmvp[1])
            cbp = cbpl | (cbpc << 4)
            wr.ue(CODENUM_FROM_CBP_INTER[cbp])
            if cbp:
                wr.se(0)  # mb_qp_delta
            for blk in range(16):
                bx, by = _blk_xy(blk)
                gx, gy = mx * 4 + bx, my * 4 + by
                if cbpl & (1 << (blk >> 2)):
                    n_c = _nc_from_grid(tc_y, gx, gy)
                    tc_y[gy, gx] = encode_residual_block(
                        wr, lv_[blk], n_c
                    )
                else:
                    tc_y[gy, gx] = 0
            _write_chroma_residual(
                wr, tc_c, mx, my, cbpc, cdc_, cac_
            )

        # --- P_L0_16x16 candidate: motion search + residual,
        # over EVERY active reference (ref_idx priced into the bits)
        best16 = None
        for ridx in range(n_ref0):
            rr = refs0[ridx]
            mvp_r = predict_mv_part(
                est.mvf, mx * 4, my * 4, 4, ref_idx=ridx
            )
            mv_r = _motion_search(
                rr[0], src_mb, px, py, mvp_r, search_range
            )
            pred_y_r = mc_luma(rr[0], px, py, mv_r[0], mv_r[1])
            if wp is not None:
                pred_y_r = wp_apply(pred_y_r, wp[1], wp[2], wp[0])
            lv_r, cbpl_r = _quant_luma_mb(src_mb, pred_y_r, qp)
            pcb_r = mc_chroma(rr[1], cx, cy, mv_r[0], mv_r[1])
            pcr_r = mc_chroma(rr[2], cx, cy, mv_r[0], mv_r[1])
            cbpc_r, cdc_r, cac_r, crec_r = _quant_chroma_resid(
                (pcb_r, pcr_r), src_cb_mb, src_cr_mb, qpc
            )
            rec_r = _recon_luma_mb(pred_y_r, lv_r, cbpl_r, qp)
            ssd_r = int(((rec_r - src_mb) ** 2).sum())
            ssd_r += int(((crec_r[0] - src_cb_mb) ** 2).sum())
            ssd_r += int(((crec_r[1] - src_cr_mb) ** 2).sum())
            probe = _BitWriter()
            write_inter(probe, 0, [(mvp_r, mv_r)], lv_r, cbpl_r,
                        cbpc_r, cdc_r, cac_r, est.tc_y.copy(),
                        [g.copy() for g in est.tc_c],
                        ridxs=[ridx])
            c_r = ssd_r + lam * _bits_of(probe)
            if best16 is None or c_r < best16[0]:
                best16 = (c_r, ridx, mvp_r, mv_r, lv_r, cbpl_r,
                          cbpc_r, cdc_r, cac_r, rec_r, crec_r, ssd_r)
        (cost_p, ridx16, mvp, mv, lv, cbp_luma, cbp_chroma, cdc,
         cac, rec_y, crec, ssd_p) = best16

        # --- partitioned candidates: 16x8 / 8x16 / P_8x8 ---
        # later partitions' predictors depend on earlier decided
        # MVs, probed through MvField's override before committing.
        # Early termination (the standard encoder speedup): when
        # the 16x16 candidate already reconstructs with SSD below
        # the rate cost of even one extra mvd pair, no partition
        # split can win the RD comparison — skip the probes.
        part = None  # (cost, mbt, mvpairs, geo, lv, cbpl, cbpc,
        #              cdc, cac, rec_y, crec)
        shapes = () if ssd_p <= lam * 8 else (
            (1, ((mx * 4, my * 4, 4, 2, "B"),
                 (mx * 4, my * 4 + 2, 4, 2, "A"))),
            (2, ((mx * 4, my * 4, 2, 4, "A"),
                 (mx * 4 + 2, my * 4, 2, 4, "C"))),
            # P_8x8 with four 8x8 sub-blocks (sub_mb_type 0 each;
            # median prediction per quadrant, no directional rule);
            # with several active references emit P_8x8ref0 (mb_type
            # 4): quadrants pinned to reference 0, no ref_idx syntax
            (3 if n_ref0 == 1 else 4,
             ((mx * 4, my * 4, 2, 2, None),
                 (mx * 4 + 2, my * 4, 2, 2, None),
                 (mx * 4, my * 4 + 2, 2, 2, None),
                 (mx * 4 + 2, my * 4 + 2, 2, 2, None))),
        )
        for mbt, geo in shapes:
            ov: dict = {}
            mvpairs = []
            pred2 = np.zeros((16, 16), dtype=np.int64)
            pcb2 = np.zeros((8, 8), dtype=np.int64)
            pcr2 = np.zeros((8, 8), dtype=np.int64)
            for gx, gy, w4, h4, dirn in geo:
                pmvp = predict_mv_part(
                    est.mvf, gx, gy, w4, dirn, override=ov
                )
                bw_, bh_ = w4 * 4, h4 * 4
                px_, py_ = gx * 4, gy * 4
                pmv = _motion_search(
                    ref[0],
                    src_y[py_ : py_ + bh_, px_ : px_ + bw_],
                    px_, py_, pmvp, search_range,
                    bh=bh_, bw=bw_,
                )
                for yy in range(gy, gy + h4):
                    for xx in range(gx, gx + w4):
                        ov[(xx, yy)] = pmv
                mvpairs.append((pmvp, pmv))
                lx, ly = px_ - px, py_ - py
                pred2[ly : ly + bh_, lx : lx + bw_] = mc_luma(
                    ref[0], px_, py_, pmv[0], pmv[1],
                    bh=bh_, bw=bw_,
                )
                pcb2[
                    ly // 2 : ly // 2 + bh_ // 2,
                    lx // 2 : lx // 2 + bw_ // 2,
                ] = mc_chroma(
                    ref[1], px_ // 2, py_ // 2, pmv[0], pmv[1],
                    bh=bh_ // 2, bw=bw_ // 2,
                )
                pcr2[
                    ly // 2 : ly // 2 + bh_ // 2,
                    lx // 2 : lx // 2 + bw_ // 2,
                ] = mc_chroma(
                    ref[2], px_ // 2, py_ // 2, pmv[0], pmv[1],
                    bh=bh_ // 2, bw=bw_ // 2,
                )
            if wp is not None:
                pred2 = wp_apply(pred2, wp[1], wp[2], wp[0])
            lv2, cbpl2 = _quant_luma_mb(src_mb, pred2, qp)
            cbpc2, cdc2, cac2, crec2 = _quant_chroma_resid(
                (pcb2, pcr2), src_cb_mb, src_cr_mb, qpc
            )
            rec2 = _recon_luma_mb(pred2, lv2, cbpl2, qp)
            ssd2 = int(((rec2 - src_mb) ** 2).sum())
            ssd2 += int(((crec2[0] - src_cb_mb) ** 2).sum())
            ssd2 += int(((crec2[1] - src_cr_mb) ** 2).sum())
            probe2 = _BitWriter()
            write_inter(probe2, mbt, mvpairs, lv2, cbpl2, cbpc2,
                        cdc2, cac2, est.tc_y.copy(),
                        [g.copy() for g in est.tc_c])
            c2 = ssd2 + lam * _bits_of(probe2)
            if part is None or c2 < part[0]:
                part = (c2, mbt, mvpairs, geo, lv2, cbpl2, cbpc2,
                        cdc2, cac2, rec2, crec2)
        cost_part = part[0] if part is not None else float("inf")

        # --- P_Skip candidate: skip MV, no residual, ~free bits ---
        mv_sk = skip_mv(est.mvf, mx, my)
        skip_y = mc_luma(ref[0], px, py, mv_sk[0], mv_sk[1])
        if wp is not None:
            skip_y = wp_apply(skip_y, wp[1], wp[2], wp[0])
        skip_cb = np.clip(
            mc_chroma(ref[1], cx, cy, mv_sk[0], mv_sk[1]), 0, 255
        )
        skip_cr = np.clip(
            mc_chroma(ref[2], cx, cy, mv_sk[0], mv_sk[1]), 0, 255
        )
        ssd_skip = int(((skip_y - src_mb) ** 2).sum())
        ssd_skip += int(((skip_cb - src_cb_mb) ** 2).sum())
        ssd_skip += int(((skip_cr - src_cr_mb) ** 2).sum())
        cost_skip = float(ssd_skip)

        # --- intra candidate: probe on the REAL state, with the
        # macroblock-confined region saved for restore (every
        # write of _encode_intra_mb stays inside this MB's plane/
        # grid slices; neighbour reads are outside and untouched)
        saved = (
            est.y[py : py + 16, px : px + 16].copy(),
            est.cb[cy : cy + 8, cx : cx + 8].copy(),
            est.cr[cy : cy + 8, cx : cx + 8].copy(),
            est.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4].copy(),
            [
                g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2].copy()
                for g in est.tc_c
            ],
            est.mode4[
                my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
            ].copy(),
            est.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4].copy(),
            (
                est.mvf.state[
                    my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
                ].copy(),
                est.mvf.mvx[
                    my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
                ].copy(),
                est.mvf.mvy[
                    my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
                ].copy(),
                est.mvf.ref[
                    my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
                ].copy(),
            ),
        )

        def restore_mb():
            est.y[py : py + 16, px : px + 16] = saved[0]
            est.cb[cy : cy + 8, cx : cx + 8] = saved[1]
            est.cr[cy : cy + 8, cx : cx + 8] = saved[2]
            est.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = (
                saved[3]
            )
            for g, sg in zip(est.tc_c, saved[4]):
                g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = sg
            est.mode4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = (
                saved[5]
            )
            est.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = (
                saved[6]
            )
            blk4 = np.s_[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4]
            est.mvf.state[blk4] = saved[7][0]
            est.mvf.mvx[blk4] = saved[7][1]
            est.mvf.mvy[blk4] = saved[7][2]
            est.mvf.ref[blk4] = saved[7][3]

        # intra probe early exit: an intra macroblock costs at
        # least its mode/CBP syntax (~10 bits); when an inter
        # candidate is already cheaper than that floor, skip the
        # (expensive) full intra reconstruction probe
        if min(cost_skip, cost_p, cost_part) <= lam * 10:
            probe_w = None
            cost_i = float("inf")
        else:
            probe_w = _BitWriter()
            _encode_intra_mb(
                probe_w, est, mx, my, src_mb, src_cb_mb,
                src_cr_mb, qp, qpc, mb_type_offset=5,
            )
            ssd_i = int(
                ((est.y[py : py + 16, px : px + 16] - src_mb) ** 2)
                .sum()
            )
            ssd_i += int(
                ((est.cb[cy : cy + 8, cx : cx + 8] - src_cb_mb)
                 ** 2).sum()
            )
            ssd_i += int(
                ((est.cr[cy : cy + 8, cx : cx + 8] - src_cr_mb)
                 ** 2).sum()
            )
            cost_i = ssd_i + lam * _bits_of(probe_w)

        best_inter = min(cost_p, cost_part)
        if cost_skip <= best_inter and cost_skip <= cost_i:
            restore_mb()
            skip_run += 1
            est.y[py : py + 16, px : px + 16] = skip_y
            est.cb[cy : cy + 8, cx : cx + 8] = skip_cb
            est.cr[cy : cy + 8, cx : cx + 8] = skip_cr
            est.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
            for c in range(2):
                est.tc_c[c][
                    my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2
                ] = 0
            est.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = True
            est.mvf.put_inter(my * 4, mx * 4, 4, 4, mv_sk)
            continue

        s.ue(skip_run)  # mb_skip_run before every coded MB
        skip_run = 0
        if cost_i < best_inter:  # intra fallback (scene change etc.)
            # the probe already committed its reconstruction and
            # grid updates to est — just replay its bits
            _append_bits(s, probe_w)
            continue

        restore_mb()
        if cost_part < cost_p:
            # --- emit P_L0_L0_16x8 / 8x16 ---
            (_c, mbt, mvpairs, geo, lv2, cbpl2, cbpc2, cdc2,
             cac2, rec2, crec2) = part
            write_inter(s, mbt, mvpairs, lv2, cbpl2, cbpc2,
                        cdc2, cac2, est.tc_y, est.tc_c)
            est.y[py : py + 16, px : px + 16] = rec2
            est.cb[cy : cy + 8, cx : cx + 8] = crec2[0]
            est.cr[cy : cy + 8, cx : cx + 8] = crec2[1]
            est.dec4[
                my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4
            ] = True
            for (gx, gy, w4, h4, _d), (_pmvp, pmv) in zip(
                geo, mvpairs
            ):
                est.mvf.put_inter(gy, gx, h4, w4, pmv)
            continue

        # --- emit P_L0_16x16 ---
        write_inter(s, 0, [(mvp, mv)], lv, cbp_luma, cbp_chroma,
                    cdc, cac, est.tc_y, est.tc_c, ridxs=[ridx16])
        est.y[py : py + 16, px : px + 16] = rec_y
        est.cb[cy : cy + 8, cx : cx + 8] = crec[0]
        est.cr[cy : cy + 8, cx : cx + 8] = crec[1]
        est.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = True
        est.mvf.put_inter(my * 4, mx * 4, 4, 4, mv, ref_idx=ridx16)

    if skip_run:  # trailing skips close the slice (7.3.4)
        s.ue(skip_run)




def _encode_b_slice_mbs(s, est, src, ref0, ref1, col, qp, qpc,
                        mbw, mbh, search_range,
                        temporal: bool = False, pocs=None):
    """RD macroblock loop of one B slice (the 16x16 tier the pure
    decoder accepts): per macroblock, probe B_Skip and
    B_Direct_16x16 (spatial direct, 8.4.1.2.2), B_L0/L1_16x16
    (per-list motion search) and B_Bi_16x16 (default bi-prediction
    average of the two searched signals), plus the intra fallback
    (mb_type offset 23) — every candidate reconstructed through the
    decoder's exact MC + dequant path, cheapest SSD + lambda*bits
    wins.  `col` is the colocated (list-1 reference) motion dict the
    spatial-direct colZeroFlag rule reads."""
    import numpy as np

    from finanalyzer_spark.operators.h264 import _BitWriter
    from finanalyzer_spark.operators.h264_cavlc import (
        _b_direct_predict,
        _blk_xy,
        _commit_b_motion,
        _encode_intra_mb,
        _nc_from_grid,
        _quant_chroma_resid,
        _write_chroma_residual,
        encode_residual_block,
    )

    src_y, src_cb, src_cr = src
    ref0 = _wrap_refs(ref0)
    ref1 = _wrap_refs(ref1)
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
    skip_run = 0
    for mb in range(mbw * mbh):
        my, mx = divmod(mb, mbw)
        px, py = mx * 16, my * 16
        cx, cy = mx * 8, my * 8
        src_mb = src_y[py : py + 16, px : px + 16]
        src_cb_mb = src_cb[cy : cy + 8, cx : cx + 8]
        src_cr_mb = src_cr[cy : cy + 8, cx : cx + 8]

        def write_b(wr, mbt, mvpairs, lv_, cbpl, cbpc, cdc_, cac_,
                    tc_y, tc_c):
            """B mb_type + list-ordered mvds + CBP + shared CAVLC
            residual (7.3.5; single reference per list → no ref_idx
            syntax; B_Direct_16x16 carries no mvd at all)."""
            wr.ue(mbt)
            for pmvp, pmv in mvpairs:
                wr.se(pmv[0] - pmvp[0])
                wr.se(pmv[1] - pmvp[1])
            cbp = cbpl | (cbpc << 4)
            wr.ue(CODENUM_FROM_CBP_INTER[cbp])
            if cbp:
                wr.se(0)  # mb_qp_delta
            for blk in range(16):
                bx, by = _blk_xy(blk)
                gx, gy = mx * 4 + bx, my * 4 + by
                if cbpl & (1 << (blk >> 2)):
                    n_c = _nc_from_grid(tc_y, gx, gy)
                    tc_y[gy, gx] = encode_residual_block(
                        wr, lv_[blk], n_c
                    )
                else:
                    tc_y[gy, gx] = 0
            _write_chroma_residual(wr, tc_c, mx, my, cbpc, cdc_, cac_)

        def ssd3(ry, rcb, rcr):
            return (
                int(((ry - src_mb) ** 2).sum())
                + int(((rcb - src_cb_mb) ** 2).sum())
                + int(((rcr - src_cr_mb) ** 2).sum())
            )

        # --- spatial direct derivation (B_Skip + B_Direct share it) ---
        use0, use1, mv0s, mv1s, dpred = _b_direct_predict(
            est.mvf, est.mvf1, col, True, mx, my, ref0, ref1,
            temporal, pocs,
        )
        dp_y, dp_cb, dp_cr = dpred
        skip_y = np.clip(dp_y, 0, 255)
        skip_cb = np.clip(dp_cb, 0, 255)
        skip_cr = np.clip(dp_cr, 0, 255)
        cost_skip = float(ssd3(skip_y, skip_cb, skip_cr))

        # --- B_Direct_16x16 with residual ---
        lv_d, cbpl_d = _quant_luma_mb(src_mb, dp_y, qp)
        cbpc_d, cdc_d, cac_d, crec_d = _quant_chroma_resid(
            (dp_cb, dp_cr), src_cb_mb, src_cr_mb, qpc
        )
        rec_d = _recon_luma_mb(dp_y, lv_d, cbpl_d, qp)
        probe_d = _BitWriter()
        write_b(probe_d, 0, [], lv_d, cbpl_d, cbpc_d, cdc_d, cac_d,
                est.tc_y.copy(), [g.copy() for g in est.tc_c])
        cost_d = (
            ssd3(rec_d, crec_d[0], crec_d[1]) + lam * _bits_of(probe_d)
        )

        # --- uni- and bi-predictive 16x16 candidates ---
        mvp0 = predict_mv(est.mvf, mx, my)
        mv0 = _motion_search(ref0[0], src_mb, px, py, mvp0, search_range)
        p0 = (
            mc_luma(ref0[0], px, py, mv0[0], mv0[1]),
            mc_chroma(ref0[1], cx, cy, mv0[0], mv0[1]),
            mc_chroma(ref0[2], cx, cy, mv0[0], mv0[1]),
        )
        mvp1 = predict_mv(est.mvf1, mx, my)
        mv1 = _motion_search(ref1[0], src_mb, px, py, mvp1, search_range)
        p1 = (
            mc_luma(ref1[0], px, py, mv1[0], mv1[1]),
            mc_chroma(ref1[1], cx, cy, mv1[0], mv1[1]),
            mc_chroma(ref1[2], cx, cy, mv1[0], mv1[1]),
        )
        cands = []
        for mbt, preds, mvpairs in (
            (1, p0, [(mvp0, mv0)]),
            (2, p1, [(mvp1, mv1)]),
            (
                3,
                tuple(bi_average(a, b) for a, b in zip(p0, p1)),
                [(mvp0, mv0), (mvp1, mv1)],
            ),
        ):
            lv_, cbpl = _quant_luma_mb(src_mb, preds[0], qp)
            cbpc, cdc, cac, crec = _quant_chroma_resid(
                (preds[1], preds[2]), src_cb_mb, src_cr_mb, qpc
            )
            rec = _recon_luma_mb(preds[0], lv_, cbpl, qp)
            probe = _BitWriter()
            write_b(probe, mbt, mvpairs, lv_, cbpl, cbpc, cdc, cac,
                    est.tc_y.copy(), [g.copy() for g in est.tc_c])
            cands.append((
                ssd3(rec, crec[0], crec[1]) + lam * _bits_of(probe),
                mbt, mvpairs, lv_, cbpl, cbpc, cdc, cac, rec, crec,
            ))
        best = min(cands, key=lambda t: t[0])

        # --- intra probe on the real state, MB-confined save/restore
        # (the B variant must also save both motion fields) ---
        blk4 = np.s_[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4]
        saved = (
            est.y[py : py + 16, px : px + 16].copy(),
            est.cb[cy : cy + 8, cx : cx + 8].copy(),
            est.cr[cy : cy + 8, cx : cx + 8].copy(),
            est.tc_y[blk4].copy(),
            [
                g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2].copy()
                for g in est.tc_c
            ],
            est.mode4[blk4].copy(),
            est.dec4[blk4].copy(),
            (
                est.mvf.state[blk4].copy(),
                est.mvf.mvx[blk4].copy(),
                est.mvf.mvy[blk4].copy(),
                est.mvf.ref[blk4].copy(),
            ),
            (
                est.mvf1.state[blk4].copy(),
                est.mvf1.mvx[blk4].copy(),
                est.mvf1.mvy[blk4].copy(),
                est.mvf1.ref[blk4].copy(),
            ),
        )

        def restore_mb():
            est.y[py : py + 16, px : px + 16] = saved[0]
            est.cb[cy : cy + 8, cx : cx + 8] = saved[1]
            est.cr[cy : cy + 8, cx : cx + 8] = saved[2]
            est.tc_y[blk4] = saved[3]
            for g, sg in zip(est.tc_c, saved[4]):
                g[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = sg
            est.mode4[blk4] = saved[5]
            est.dec4[blk4] = saved[6]
            est.mvf.state[blk4] = saved[7][0]
            est.mvf.mvx[blk4] = saved[7][1]
            est.mvf.mvy[blk4] = saved[7][2]
            est.mvf.ref[blk4] = saved[7][3]
            est.mvf1.state[blk4] = saved[8][0]
            est.mvf1.mvx[blk4] = saved[8][1]
            est.mvf1.mvy[blk4] = saved[8][2]
            est.mvf1.ref[blk4] = saved[8][3]

        if min(cost_skip, cost_d, best[0]) <= lam * 10:
            probe_w = None
            cost_i = float("inf")
        else:
            probe_w = _BitWriter()
            _encode_intra_mb(
                probe_w, est, mx, my, src_mb, src_cb_mb, src_cr_mb,
                qp, qpc, mb_type_offset=B_INTRA_OFFSET,
            )
            cost_i = ssd3(
                est.y[py : py + 16, px : px + 16],
                est.cb[cy : cy + 8, cx : cx + 8],
                est.cr[cy : cy + 8, cx : cx + 8],
            ) + lam * _bits_of(probe_w)

        best_coded = min(cost_d, best[0])
        if cost_skip <= best_coded and cost_skip <= cost_i:
            restore_mb()
            skip_run += 1
            est.y[py : py + 16, px : px + 16] = skip_y
            est.cb[cy : cy + 8, cx : cx + 8] = skip_cb
            est.cr[cy : cy + 8, cx : cx + 8] = skip_cr
            est.tc_y[blk4] = 0
            for c in range(2):
                est.tc_c[c][
                    my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2
                ] = 0
            est.dec4[blk4] = True
            _commit_b_motion(
                est.mvf, est.mvf1, mx, my, use0, use1, mv0s, mv1s
            )
            continue

        s.ue(skip_run)  # mb_skip_run before every coded MB
        skip_run = 0
        if cost_i < best_coded:  # intra fallback
            _append_bits(s, probe_w)  # probe already committed state
            continue

        restore_mb()
        if cost_d <= best[0]:
            # --- emit B_Direct_16x16 ---
            write_b(s, 0, [], lv_d, cbpl_d, cbpc_d, cdc_d, cac_d,
                    est.tc_y, est.tc_c)
            est.y[py : py + 16, px : px + 16] = rec_d
            est.cb[cy : cy + 8, cx : cx + 8] = crec_d[0]
            est.cr[cy : cy + 8, cx : cx + 8] = crec_d[1]
            est.dec4[blk4] = True
            _commit_b_motion(
                est.mvf, est.mvf1, mx, my, use0, use1, mv0s, mv1s
            )
            continue

        # --- emit B_L0 / B_L1 / B_Bi 16x16 ---
        (_c, mbt, mvpairs, lv_, cbpl, cbpc, cdc, cac, rec, crec) = best
        write_b(s, mbt, mvpairs, lv_, cbpl, cbpc, cdc, cac,
                est.tc_y, est.tc_c)
        est.y[py : py + 16, px : px + 16] = rec
        est.cb[cy : cy + 8, cx : cx + 8] = crec[0]
        est.cr[cy : cy + 8, cx : cx + 8] = crec[1]
        est.dec4[blk4] = True
        if mbt in (1, 3):
            est.mvf.put_inter(my * 4, mx * 4, 4, 4, mv0)
        else:
            est.mvf.put_intra(my * 4, mx * 4, 4, 4)
        if mbt in (2, 3):
            est.mvf1.put_inter(my * 4, mx * 4, 4, 4, mv1)
        else:
            est.mvf1.put_intra(my * 4, mx * 4, 4, 4)
    if skip_run:  # trailing skips close the slice (7.3.4)
        s.ue(skip_run)



def _bgop_filter(est, qp: int, mbw: int, mbh: int, is_b: bool) -> None:
    """Run the §8.7 filter over an encoder reconstruction, mirroring
    decode_slice: single-list bS inputs for I/P pictures, two-list
    (motion + usage grids) for B pictures.  Intra flags: I/P mark
    `mvf` INTRA only for true intra macroblocks; in B pictures a
    list-unused block is also marked INTRA in that list's field, so
    a B macroblock is intra exactly when BOTH fields say INTRA."""
    import numpy as np

    from .h264_deblock import deblock_picture

    s0 = est.mvf.state[::4, ::4]
    if is_b:
        s1 = est.mvf1.state[::4, ::4]
        intra_flags = (s0 == MvField.INTRA) & (s1 == MvField.INTRA)
        bkw = {
            "mvx4_l1": est.mvf1.mvx,
            "mvy4_l1": est.mvf1.mvy,
            "use0_4": est.mvf.state == MvField.INTER,
            "use1_4": est.mvf1.state == MvField.INTER,
        }
    else:
        intra_flags = s0 == MvField.INTRA
        bkw = {}
    deblock_picture(
        est.y, est.cb, est.cr,
        np.full((mbh, mbw), qp, dtype=np.int64),
        intra_flags, est.tc_y, est.mvf.mvx, est.mvf.mvy, 0,
        ref4=est.mvf.ref, **bkw,
    )


def _encode_bgop(planes, qp, gop, b_frames, search_range, recon_out,
                 direct_mode: str = "spatial", deblock: bool = False):
    """B-GOP driver: closed GOPs of `gop` display frames — an IDR,
    P references every b_frames+1 display positions (plus a trailing
    P when the GOP length isn't aligned), and B pictures between
    consecutive references, emitted in decode order (future reference
    first, POC type 0 carries display order).  B pictures are
    non-reference NALs (nal_ref_idc 0); the deblocking filter runs
    per the `deblock` flag — B slices deblock natively with the
    two-list boundary-strength rule (h264_deblock), and reference
    frames run the shared P/intra closed loops.
    `recon_out` collects reconstructions in DISPLAY order — the same
    order decode_h264_annexb emits."""
    import numpy as np

    from finanalyzer_spark.operators.h264 import (
        NAL_IDR,
        NAL_PPS,
        NAL_SLICE,
        NAL_SPS,
        _BitWriter,
        _nal,
        write_sps_pps,
    )
    from finanalyzer_spark.operators.h264_cavlc import (
        _EncState,
        _encode_intra_mb,
        chroma_qp,
    )

    h, w = planes[0][0].shape
    mbw, mbh = w // 16, h // 16
    qpc = chroma_qp(qp, 0)
    sps_rbsp, pps_rbsp = write_sps_pps(
        mbw, mbh, pic_init_qp=qp, deblocking_control=True,
        poc_type=0, num_ref_frames=2,
    )
    out = bytearray()
    out += _nal(NAL_SPS, 3, sps_rbsp)
    out += _nal(NAL_PPS, 3, pps_rbsp)
    n = len(planes)
    step = b_frames + 1

    def src64(disp):
        y8, cb8, cr8 = planes[disp]
        return (
            y8.astype(np.int64),
            cb8.astype(np.int64),
            cr8.astype(np.int64),
        )

    def header(kind, frame_num, poc_lsb, idr_id=0):
        s = _BitWriter()
        s.ue(0)                     # first_mb_in_slice
        s.ue({"I": 7, "P": 5, "B": 6}[kind])  # slice_type (all slices)
        s.ue(0)                     # pps_id
        s.u(frame_num % 256, 8)     # frame_num
        if kind == "I":
            s.ue(idr_id)            # idr_pic_id
        s.u(poc_lsb % 256, 8)       # pic_order_cnt_lsb (poc_type 0)
        if kind == "B":
            # direct_spatial_mv_pred_flag: 1 spatial, 0 temporal
            s.u(0 if direct_mode == "temporal" else 1, 1)
        if kind in ("P", "B"):
            s.u(0, 1)               # num_ref_idx_active_override_flag
            s.u(0, 1)               # ref_pic_list_modification_flag_l0
            if kind == "B":
                s.u(0, 1)           # ref_pic_list_modification_flag_l1
        if kind == "I":
            s.u(0, 1)               # no_output_of_prior_pics
            s.u(0, 1)               # long_term_reference
        elif kind == "P":
            s.u(0, 1)               # adaptive_ref_pic_marking_mode
        # (B is non-reference: no dec_ref_pic_marking at all, 7.3.3)
        s.se(0)                     # slice_qp_delta
        if deblock:
            s.ue(0)                 # disable_deblocking_filter_idc: ON
            s.se(0)                 # slice_alpha_c0_offset_div2
            s.se(0)                 # slice_beta_offset_div2
        else:
            s.ue(1)                 # disable_deblocking_filter_idc
        return s

    for gi, g0 in enumerate(range(0, n, gop)):
        gend = min(g0 + gop, n)
        refs = list(range(g0, gend, step))
        if refs[-1] != gend - 1:
            refs.append(gend - 1)
        ref_state: dict = {}  # disp → (int64 planes, motion dict)
        recons: dict = {}     # disp → u8 planes
        for ri, disp in enumerate(refs):
            est = _EncState(mbw, mbh)
            src = src64(disp)
            if ri == 0:  # IDR opens the (closed) GOP
                s = header("I", 0, 0, idr_id=gi % 16)
                for mb in range(mbw * mbh):
                    my, mx = divmod(mb, mbw)
                    _encode_intra_mb(
                        s, est, mx, my,
                        src[0][my * 16 : my * 16 + 16,
                               mx * 16 : mx * 16 + 16],
                        src[1][my * 8 : my * 8 + 8,
                               mx * 8 : mx * 8 + 8],
                        src[2][my * 8 : my * 8 + 8,
                               mx * 8 : mx * 8 + 8],
                        qp, qpc,
                    )
                s.rbsp_trailing()
                out += _nal(NAL_IDR, 3, bytes(s.out))
            else:
                prev_recon = ref_state[refs[ri - 1]][0]
                s = header("P", ri, 2 * (disp - g0))
                _encode_p_slice_mbs(
                    s, est, src, prev_recon, qp, qpc, mbw, mbh,
                    search_range, None,
                )
                s.rbsp_trailing()
                out += _nal(NAL_SLICE, 2, bytes(s.out))
            if deblock:
                # in-loop: filter BEFORE the reconstruction becomes a
                # reference or output, mirroring decode_slice
                _bgop_filter(est, qp, mbw, mbh, is_b=False)
            ref_state[disp] = (
                (est.y.copy(), est.cb.copy(), est.cr.copy()),
                {
                    "state": est.mvf.state.copy(),
                    "mvx": est.mvf.mvx.copy(),
                    "mvy": est.mvf.mvy.copy(),
                    "ref": est.mvf.ref.copy(),
                },
            )
            recons[disp] = est.planes_u8()
            if ri == 0:
                continue
            # B pictures between the previous and this reference,
            # decode order AFTER the future reference
            l0_disp, l1_disp = refs[ri - 1], disp
            for bd in range(l0_disp + 1, l1_disp):
                est = _EncState(mbw, mbh)
                s = header("B", ri + 1, 2 * (bd - g0))
                _encode_b_slice_mbs(
                    s, est, src64(bd),
                    ref_state[l0_disp][0], ref_state[l1_disp][0],
                    ref_state[l1_disp][1],
                    qp, qpc, mbw, mbh, search_range,
                    temporal=direct_mode == "temporal",
                    pocs=(
                        2 * (bd - g0),
                        2 * (l0_disp - g0),
                        2 * (l1_disp - g0),
                    ),
                )
                s.rbsp_trailing()
                out += _nal(NAL_SLICE, 0, bytes(s.out))
                if deblock:
                    _bgop_filter(est, qp, mbw, mbh, is_b=True)
                recons[bd] = est.planes_u8()
        if recon_out is not None:
            for d in range(g0, gend):
                recon_out.append(recons[d])
    return bytes(out)


def encode_h264_video(
    frames,
    qp: int = 28,
    gop: int = 8,
    yuv: bool = False,
    search_range: int = 4,
    recon_out: list | None = None,
    deblock: bool = False,
    wp: tuple | None = None,
    b_frames: int = 0,
    b_direct: str = "spatial",
    refs: int = 1,
) -> bytes:
    """Encoder twin for the motion-compensated tier: an Annex-B
    baseline stream of IDR pictures every `gop` frames with P
    pictures between — P macroblocks are P_Skip, P_L0_16x16 (motion
    search through the decoder's exact quarter-pel interpolation), or
    intra fallback (I_4x4/I_16x16, mb_type offset 5), whichever
    reconstructs with the least SSD.  Closed loop throughout: every
    candidate is reconstructed through the decoder's own MC + dequant
    path, so decode(encode(x)) equals the encoder's reconstruction
    bit-for-bit (recon_out collects it per frame, as in
    encode_h264_intra).  With `deblock=False` the filter is
    explicitly disabled per slice; with `deblock=True` the stream is
    a DEFAULT baseline stream (no deblocking-control syntax) and the
    encoder runs the §8.7 filter over every reconstruction BEFORE it
    becomes the next frame's reference — true in-loop filtering, the
    same order decode_slice applies.  `gop` must be >= 2 (consecutive
    IDRs would need distinct idr_pic_id handling this twin doesn't
    model).  `wp=(lwd, w, o)` enables explicit LUMA weighted
    prediction (8.4.2.3) on every P slice — pred' =
    ((pred*w + 2^(lwd-1)) >> lwd) + o — the fade tool; chroma keeps
    identity weights.  The twin applies the same weighting in its
    reconstruction loop, so the closed loop stays bit-exact.

    `b_frames=n` switches to the B-GOP driver (_encode_bgop): closed
    GOPs of IDR + P references every n+1 display positions with
    non-reference B pictures between, POC type 0 / Main profile /
    2-reference DPB, B macroblocks RD-chosen among B_Skip /
    B_Direct_16x16 (spatial direct) / B_L0 / B_L1 / B_Bi / intra
    fallback (_encode_b_slice_mbs).  `recon_out` then collects
    reconstructions in DISPLAY order, matching the decoder's POC
    re-ordered output; `deblock=True` runs the §8.7 filter in-loop on
    every picture (two-list bS inside B slices); wp is rejected
    (weighting is unmodelled in the B tier)."""
    import numpy as np

    from finanalyzer_spark.operators.h264 import (
        NAL_PPS,
        NAL_SLICE,
        NAL_SPS,
        _BitWriter,
        _nal,
        write_sps_pps,
    )
    from finanalyzer_spark.operators.h264_cavlc import (
        _blk_xy,
        _EncState,
        _encode_intra_mb,
        _frames_to_planes,
        _nc_from_grid,
        _quant_chroma_resid,
        _recon_chroma,
        _write_chroma_residual,
        chroma_qp,
        dequant_4x4,
        encode_h264_intra,
        encode_residual_block,
        forward_transform_4x4,
        inverse_transform_4x4,
        quant_4x4,
    )

    if not 0 <= qp <= 51:
        raise ValueError("qp must be in [0, 51]")
    if gop < 2:
        raise ValueError("gop must be >= 2")
    planes, h, w = _frames_to_planes(frames, yuv)
    if refs < 1:
        raise ValueError("refs must be >= 1")
    if refs > 1 and b_frames:
        raise ValueError(
            "multi-reference encoding is modelled for the P-GOP"
            " path only (B slices keep one reference per list)"
        )
    if refs > 1 and wp is not None:
        raise ValueError(
            "weighted prediction with multiple references is not"
            " modelled"
        )
    if b_frames:
        if b_frames < 0:
            raise ValueError("b_frames must be >= 0")
        if gop > 128:
            raise ValueError(
                "b_frames GOPs carry 8-bit pic_order_cnt_lsb: gop"
                " must be <= 128"
            )
        if wp is not None:
            raise ValueError(
                "weighted prediction is not modelled for b_frames"
                " streams"
            )
        if b_direct not in ("spatial", "temporal"):
            raise ValueError("b_direct must be 'spatial' or 'temporal'")
        return _encode_bgop(
            planes, qp, gop, b_frames, search_range, recon_out,
            direct_mode=b_direct, deblock=deblock,
        )
    mbw, mbh = w // 16, h // 16
    qpc = chroma_qp(qp, 0)

    sps_rbsp, pps_rbsp = write_sps_pps(
        mbw, mbh, pic_init_qp=qp, deblocking_control=not deblock,
        weighted_pred=wp is not None,
        num_ref_frames=refs, num_ref_l0_default=refs,
    )
    out = bytearray()
    out += _nal(NAL_SPS, 3, sps_rbsp)
    out += _nal(NAL_PPS, 3, pps_rbsp)
    #: RefPicList0 of (y, cb, cr) int64 reconstructions, most recent
    #: first, capped at `refs` (the SPS sliding window)
    ref_list: list = []

    for fi, (src_y8, src_cb8, src_cr8) in enumerate(planes):
        if fi % gop == 0 or not ref_list:  # IDR
            rec: list = []
            stream = encode_h264_intra(
                [(src_y8, src_cb8, src_cr8)], qp=qp, yuv=True,
                recon_out=rec, deblock=deblock,
            )
            # keep only the IDR NAL — SPS/PPS are already out front
            # (identical bytes: same write_sps_pps parameters)
            nals = [n for n in stream.split(b"\x00\x00\x00\x01") if n]
            out += b"\x00\x00\x00\x01" + nals[-1]
            ry, rcb, rcr = rec[0]
            ref_list = [(
                ry.astype(np.int64),
                rcb.astype(np.int64),
                rcr.astype(np.int64),
            )]
            if recon_out is not None:
                recon_out.append(rec[0])
            continue

        src_y = src_y8.astype(np.int64)
        src_cb = src_cb8.astype(np.int64)
        src_cr = src_cr8.astype(np.int64)
        est = _EncState(mbw, mbh)

        n_act = min(refs, len(ref_list))
        s = _BitWriter()
        s.ue(0)                 # first_mb_in_slice
        s.ue(5)                 # slice_type: P (all slices in pic)
        s.ue(0)                 # pps_id
        s.u(fi % gop, 8)        # frame_num (increments from the IDR)
        if n_act != refs:
            # right after an IDR the DPB holds fewer references than
            # the PPS default — override the active count down
            s.u(1, 1)           # num_ref_idx_active_override_flag
            s.ue(n_act - 1)     # num_ref_idx_l0_active_minus1
        else:
            s.u(0, 1)           # num_ref_idx_active_override_flag
        s.u(0, 1)               # ref_pic_list_modification_flag_l0
        if wp is not None:      # pred_weight_table (7.3.3.2)
            s.ue(wp[0])         # luma_log2_weight_denom
            s.ue(0)             # chroma_log2_weight_denom (identity)
            s.u(1, 1)           # luma_weight_l0_flag
            s.se(wp[1])
            s.se(wp[2])
            s.u(0, 1)           # chroma_weight_l0_flag
        s.u(0, 1)               # adaptive_ref_pic_marking_mode_flag
        s.se(0)                 # slice_qp_delta
        if not deblock:
            s.ue(1)             # disable_deblocking_filter_idc

        _encode_p_slice_mbs(
            s, est, (src_y, src_cb, src_cr), ref_list, qp, qpc, mbw,
            mbh, search_range, wp, n_ref0=n_act,
        )
        s.rbsp_trailing()
        out += _nal(NAL_SLICE, 2, bytes(s.out))
        if deblock:
            # in-loop: filter the reconstruction BEFORE it becomes the
            # reference, mirroring decode_slice (constant slice QP, no
            # I_PCM in the encoder, intra MBs are the mv=None ones)
            from .h264_deblock import deblock_picture

            intra_flags = (
                est.mvf.state[::4, ::4] == MvField.INTRA
            )
            deblock_picture(
                est.y, est.cb, est.cr,
                np.full((mbh, mbw), qp, dtype=np.int64),
                intra_flags, est.tc_y, est.mvf.mvx, est.mvf.mvy, 0,
                ref4=est.mvf.ref,
            )
        ref_list.insert(
            0, (est.y.copy(), est.cb.copy(), est.cr.copy())
        )
        del ref_list[refs:]
        if recon_out is not None:
            recon_out.append(est.planes_u8())
    return bytes(out)
