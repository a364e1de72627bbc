"""H.264 in-loop deblocking filter (ITU-T H.264 §8.7) for the pure
CAVLC tier — the piece that widens exact decode from deblock-disabled
streams to DEFAULT baseline streams (encoders rarely disable the
filter; `disable_deblocking_filter_idc` is absent or 0 in almost all
real-world Annex-B/MP4/MKV payloads).

Reference behavior being reproduced (public spec + public sources):
* §8.7: per-macroblock in raster order — vertical luma/chroma edges
  left→right, then horizontal edges top→bottom, each edge filtering
  in place over already-filtered samples.
* Table 8-16 (alpha/beta vs indexA/indexB) and Table 8-17 (tc0 vs
  indexA and bS) — transcribed below; the same constants appear in
  every public implementation (JM, ffmpeg `alpha_table`/`beta_table`/
  `tc0_table`, x264). tests/test_h264_deblock.py pins the published
  endpoints, the zero prefix, monotonicity and the ~2x-per-6-QP
  growth law so a transcription slip cannot hide behind the
  closed-loop encoder twin (which would faithfully reproduce a wrong
  table on both sides); an env-gated external-decoder conformance
  test covers environments that have one.
* Boundary strength (§8.7.2.1, progressive frames): 4 on macroblock
  edges with an intra side, 3 on internal edges with an intra side,
  2 when either 4x4 luma block has coded coefficients, 1 on a
  motion mismatch (|mv delta| ≥ 4 quarter-sample units — one integer
  sample), else 0 (no filtering).  The motion test runs on the
  4x4-granularity MV field, so 16x8/8x16 partition boundaries inside
  one macroblock are strength-1 candidates exactly as the spec
  requires; single reference per list, as the pure tiers produce.
  For B pictures the inter-inter rule compares reference SETS first
  (a block predicting from list 0, list 1 or both against a block
  using a different set → strength 1 — in this tier the two lists
  are always distinct pictures), then per-list MV deltas.
* I_PCM macroblocks carry QPY = 0 for the filter (§8.7 note) — at
  qPav below 16 both alpha and beta are 0, so I_PCM/I_PCM edges are
  identity; that is why the I_PCM-only twin never needed the filter.

Scale note: this is per-picture pixel work inside the same Arrow
`mapInPandas` codec kernels as the rest of the tier — embarrassingly
parallel across media rows, no Spark-side consequence.
"""

from __future__ import annotations


def _np():
    import numpy as np

    return np


#: Table 8-16 — alpha(indexA); zero below indexA 16 (filter off)
ALPHA_TABLE = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255,
)
#: Table 8-16 — beta(indexB)
BETA_TABLE = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
    16, 16, 17, 17, 18, 18,
)
#: Table 8-17 — tc0(bS, indexA) for bS 1..3 (bS 4 uses no tc0)
TC0_TABLE = (
    # bS = 1
    (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8,
     9, 10, 11, 13),
    # bS = 2
    (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
     2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11,
     12, 13, 15, 17),
    # bS = 3
    (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
     3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
     18, 20, 23, 25),
)


def _clip3(lo, hi, x):
    np = _np()
    return np.clip(x, lo, hi)


def _filter_luma_edge(get, put, bs_line, alpha, beta, tc0_line):
    """Filter one luma edge in place.  `get(k)`/`put(k, v)` access the
    eight sample vectors p3..q3 (k = 0..7) across the edge, each one
    line-vector long; `bs_line`/`tc0_line` are per-line arrays."""
    np = _np()
    bs, tc0 = bs_line, tc0_line
    p3, p2, p1, p0, q0, q1, q2, q3 = (get(k) for k in range(8))
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)
    fs = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not fs.any():  # nothing on this edge filters — skip the math
        return
    # --- normal filter (bS < 4), §8.7.2.3
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = _clip3(0, 255, p0 + delta)
    nq0 = _clip3(0, 255, q0 - delta)
    dp1 = _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1)
    dq1 = _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1)
    np1 = np.where(ap < beta, p1 + dp1, p1)
    nq1 = np.where(aq < beta, q1 + dq1, q1)
    # --- strong filter (bS == 4), §8.7.2.4
    sharp = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    strong_p = sharp & (ap < beta)
    sp0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    sp1 = (p2 + p1 + p0 + q0 + 2) >> 2
    sp2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    wp0 = (2 * p1 + p0 + q1 + 2) >> 2
    strong_q = sharp & (aq < beta)
    sq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
    sq1 = (q2 + q1 + q0 + p0 + 2) >> 2
    sq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    wq0 = (2 * q1 + q0 + p1 + 2) >> 2
    b4 = bs == 4
    out = {
        1: np.where(b4 & strong_p, sp2, p2),
        2: np.where(b4, np.where(strong_p, sp1, p1), np1),
        3: np.where(b4, np.where(strong_p, sp0, wp0), np0),
        4: np.where(b4, np.where(strong_q, sq0, wq0), nq0),
        5: np.where(b4, np.where(strong_q, sq1, q1), nq1),
        6: np.where(b4 & strong_q, sq2, q2),
    }
    orig = {1: p2, 2: p1, 3: p0, 4: q0, 5: q1, 6: q2}
    for k, v in out.items():
        put(k, np.where(fs, v, orig[k]))


def _filter_chroma_edge(get, put, bs_line, alpha, beta, tc0_line):
    """Filter one chroma edge in place (only p0/q0 move; bS==4 uses
    the 2-tap form, §8.7.2.3-4).  `get(k)`/`put(k, v)` access the four
    sample vectors p1 p0 q0 q1 (k = 0..3)."""
    np = _np()
    bs, tc0 = bs_line, tc0_line
    p1, p0, q0, q1 = (get(k) for k in range(4))
    fs = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not fs.any():  # nothing on this edge filters — skip the math
        return
    tc = tc0 + 1
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = _clip3(0, 255, p0 + delta)
    nq0 = _clip3(0, 255, q0 - delta)
    b4 = bs == 4
    out_p0 = np.where(b4, (2 * p1 + p0 + q1 + 2) >> 2, np0)
    out_q0 = np.where(b4, (2 * q1 + q0 + p1 + 2) >> 2, nq0)
    put(1, np.where(fs, out_p0, p0))
    put(2, np.where(fs, out_q0, q0))


def deblock_picture(
    y,
    cb,
    cr,
    qp_mb,
    intra_mb,
    nz4,
    mvx4,
    mvy4,
    cq_off: int = 0,
    alpha_off: int = 0,
    beta_off: int = 0,
    mvx4_l1=None,
    mvy4_l1=None,
    use0_4=None,
    use1_4=None,
    ref4=None,
):
    """Apply the §8.7 deblocking filter to a decoded picture in place.

    Parameters mirror what both the decoder (`_SliceState`) and the
    encoder twin (`_EncState`) track per picture:
      y/cb/cr   int64 planes (MB-aligned, pre-uint8-cast)
      qp_mb     (mbh, mbw) per-macroblock luma QP at decode time
                (I_PCM entries hold 0 per the spec note)
      intra_mb  (mbh, mbw) bool
      nz4       (mbh*4, mbw*4) truthy where the 4x4 luma block has
                coded coefficients (the TotalCoeff grid works
                verbatim)
      mvx4/mvy4 (mbh*4, mbw*4) quarter-pel list-0 MV component grids
                at 4x4 granularity (operators/h264_inter.MvField) —
                partition edges inside one macroblock get their bS-1
                motion test per block pair; single reference per list,
                as the pure tiers produce
      cq_off    PPS chroma_qp_index_offset
      alpha_off / beta_off   slice_alpha_c0_offset_div2 /
                slice_beta_offset_div2 (slice header, §7.4.3)
      mvx4_l1/mvy4_l1/use0_4/use1_4   B slices only: list-1 MV grids
                plus per-4x4 'predicts from list X' booleans.  The
                §8.7.2.1 inter-inter rule then compares reference
                SETS first (different lists used → bS 1 — in this
                tier list 0 and list 1 are always distinct pictures),
                and per-list MV deltas otherwise.  Omitted → the
                single-list (P) behaviour.
    """
    np = _np()
    from .h264_cavlc import chroma_qp

    qp_mb = np.asarray(qp_mb, dtype=np.int64)
    intra_mb = np.asarray(intra_mb, dtype=bool)
    nz = np.asarray(nz4) != 0
    mbh, mbw = qp_mb.shape
    fa, fb = alpha_off * 2, beta_off * 2
    mvx4 = np.asarray(mvx4)
    mvy4 = np.asarray(mvy4)
    two_lists = use0_4 is not None
    if two_lists:
        mvx1 = np.asarray(mvx4_l1)
        mvy1 = np.asarray(mvy4_l1)
        u0 = np.asarray(use0_4, dtype=bool)
        u1 = np.asarray(use1_4, dtype=bool)
    refs = None if ref4 is None else np.asarray(ref4)

    def edge_bs(pmy, pmx, qmy, qmx, pb, qb, mb_edge):
        """Boundary strength for one 4x4 block pair; pb/qb index the
        4x4 grids as (row, col)."""
        if intra_mb[pmy, pmx] or intra_mb[qmy, qmx]:
            return 4 if mb_edge else 3
        if nz[pb] or nz[qb]:
            return 2
        if two_lists:
            # 8.7.2.1 inter-inter: different reference pictures or a
            # different number of MVs → 1 (lists here are distinct
            # pictures); same set → per-list MV delta test
            if (u0[pb], u1[pb]) != (u0[qb], u1[qb]):
                return 1
            if u0[pb] and (
                abs(int(mvx4[pb]) - int(mvx4[qb])) >= 4
                or abs(int(mvy4[pb]) - int(mvy4[qb])) >= 4
            ):
                return 1
            if u1[pb] and (
                abs(int(mvx1[pb]) - int(mvx1[qb])) >= 4
                or abs(int(mvy1[pb]) - int(mvy1[qb])) >= 4
            ):
                return 1
            return 0
        if refs is not None and int(refs[pb]) != int(refs[qb]):
            # 8.7.2.1: different reference pictures (multi-ref P) → 1
            return 1
        if (
            abs(int(mvx4[pb]) - int(mvx4[qb])) >= 4
            or abs(int(mvy4[pb]) - int(mvy4[qb])) >= 4
        ):
            return 1
        return 0

    def params(qp_p, qp_q):
        qav = (qp_p + qp_q + 1) >> 1
        ia = min(max(qav + fa, 0), 51)
        ib = min(max(qav + fb, 0), 51)
        return ALPHA_TABLE[ia], BETA_TABLE[ib], ia

    def expand(bs4, ia, reps):
        bs = np.repeat(np.asarray(bs4, dtype=np.int64), reps)
        tc0 = np.repeat(
            np.asarray(
                [TC0_TABLE[b - 1][ia] if 0 < b < 4 else 0 for b in bs4],
                dtype=np.int64,
            ),
            reps,
        )
        return bs, tc0

    for my in range(mbh):
        for mx in range(mbw):
            # ---- vertical edges, left to right (§8.7 order)
            for e in (0, 4, 8, 12):
                if e == 0 and mx == 0:
                    continue
                pmx = mx - 1 if e == 0 else mx
                pcol = pmx * 4 + (3 if e == 0 else e // 4 - 1)
                bs4 = [
                    edge_bs(
                        my, pmx, my, mx,
                        (my * 4 + g, pcol),
                        (my * 4 + g, mx * 4 + e // 4),
                        e == 0,
                    )
                    for g in range(4)
                ]
                if not any(bs4):
                    continue
                alpha, beta, ia = params(
                    int(qp_mb[my, pmx]), int(qp_mb[my, mx])
                )
                if alpha:
                    bs, tc0 = expand(bs4, ia, 4)
                    r0, x = my * 16, mx * 16 + e
                    _filter_luma_edge(
                        lambda k: y[r0 : r0 + 16, x - 4 + k],
                        lambda k, v: y.__setitem__(
                            (slice(r0, r0 + 16), x - 4 + k), v
                        ),
                        bs, alpha, beta, tc0,
                    )
                if e in (0, 8):
                    ca, cbeta, cia = params(
                        chroma_qp(int(qp_mb[my, pmx]), cq_off),
                        chroma_qp(int(qp_mb[my, mx]), cq_off),
                    )
                    if ca:
                        bs, tc0 = expand(bs4, cia, 2)
                        rc, xc = my * 8, mx * 8 + e // 2
                        for pl in (cb, cr):
                            _filter_chroma_edge(
                                lambda k, p=pl: p[rc : rc + 8, xc - 2 + k],
                                lambda k, v, p=pl: p.__setitem__(
                                    (slice(rc, rc + 8), xc - 2 + k), v
                                ),
                                bs, ca, cbeta, tc0,
                            )
            # ---- horizontal edges, top to bottom
            for e in (0, 4, 8, 12):
                if e == 0 and my == 0:
                    continue
                pmy = my - 1 if e == 0 else my
                prow = pmy * 4 + (3 if e == 0 else e // 4 - 1)
                bs4 = [
                    edge_bs(
                        pmy, mx, my, mx,
                        (prow, mx * 4 + g),
                        (my * 4 + e // 4, mx * 4 + g),
                        e == 0,
                    )
                    for g in range(4)
                ]
                if not any(bs4):
                    continue
                alpha, beta, ia = params(
                    int(qp_mb[pmy, mx]), int(qp_mb[my, mx])
                )
                if alpha:
                    bs, tc0 = expand(bs4, ia, 4)
                    c0, yy = mx * 16, my * 16 + e
                    _filter_luma_edge(
                        lambda k: y[yy - 4 + k, c0 : c0 + 16],
                        lambda k, v: y.__setitem__(
                            (yy - 4 + k, slice(c0, c0 + 16)), v
                        ),
                        bs, alpha, beta, tc0,
                    )
                if e in (0, 8):
                    ca, cbeta, cia = params(
                        chroma_qp(int(qp_mb[pmy, mx]), cq_off),
                        chroma_qp(int(qp_mb[my, mx]), cq_off),
                    )
                    if ca:
                        bs, tc0 = expand(bs4, cia, 2)
                        cc, yc = mx * 8, my * 8 + e // 2
                        for pl in (cb, cr):
                            _filter_chroma_edge(
                                lambda k, p=pl: p[yc - 2 + k, cc : cc + 8],
                                lambda k, v, p=pl: p.__setitem__(
                                    (yc - 2 + k, slice(cc, cc + 8)), v
                                ),
                                bs, ca, cbeta, tc0,
                            )
