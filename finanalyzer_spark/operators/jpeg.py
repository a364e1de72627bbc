"""Pure-numpy baseline + progressive JPEG codec — no codec library.

Decoder: sequential DCT (SOF0) AND progressive DCT (SOF2, ITU-T T.81
Annex G: spectral selection + successive approximation, DC/AC first
and refinement scans, EOB runs), 8-bit, Huffman entropy coding, 1 or
3 components, 4:4:4 / 4:2:2 / 4:2:0 chroma sampling, restart
markers. Arithmetic coding and hierarchical (SOF3+) raise honest
NotImplementedError. Encoders: baseline (`encode_jpeg`, 4:4:4 or
4:2:0) and progressive (`encode_jpeg_progressive` — the standard
8-scan script: DC first at Al=1, per-component AC first at Al=1, then
DC and AC refinement to Al=0), both on quality-scaled Annex-K
quantization tables and standard Annex-K Huffman tables.  The
progressive pair quantizes identically to baseline, so
`decode(encode_progressive(x)) == decode(encode(x))` exactly — the
round-trip test that pins the multi-scan accumulation against the
already-fuzz-tested baseline path.

Everything is spec-grounded (ITU-T T.81): the zigzag order, the
default Huffman/quantization tables and the level-shift/IDCT algebra
are the published ones, with unit tests asserting the tables against
known spec values so the encoder/decoder pair cannot silently share a
transposition bug (tests/test_jpeg.py).

Reference context: the reference repo has no media surface at all —
this belongs to the extended training-data-pipeline tier
(multimodal ingestion for a 100 TB corpus), feeding the same Arrow
`mapInPandas` kernels as decode_ppm/decode_png
(operators/multimodal.decode_image_features).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# spec tables (ITU-T T.81 / JFIF)
# --------------------------------------------------------------------------

#: zigzag scan order (spec Figure 5): ZIGZAG[i] = position in the 8x8
#: block (row-major) of the i-th coefficient in transmission order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance quantization tables (quality
#: 50 base), row-major
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 standard Huffman tables: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis: M[k, n] = c(k)·cos((2n+1)kπ/16),
    c(0)=sqrt(1/8), c(k>0)=sqrt(2/8). IDCT is M.T @ B @ M."""
    n = np.arange(8)
    k = n.reshape(-1, 1)
    m = np.cos((2 * n + 1) * k * np.pi / 16)
    m[0] *= np.sqrt(0.5)
    return m * 0.5


_DCT_M = _dct_matrix()


# --------------------------------------------------------------------------
# Huffman machinery
# --------------------------------------------------------------------------
def _build_huffman_decode(bits, huffval):
    """Spec C.2 canonical codes → {(length, code): symbol}."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _build_huffman_encode(bits, huffval):
    """symbol → (code, length)."""
    dec = _build_huffman_decode(bits, huffval)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and restart-marker awareness."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via sync_restart
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI or other marker: pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Discard partial byte + the RSTn marker at a restart
        boundary (spec F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman stream")


def _extend(v: int, t: int) -> int:
    """Spec F.2.2.1 sign extension of a t-bit magnitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------
def _entropy_end(buf: bytes, start: int) -> int:
    """Index of the first real marker after entropy-coded data
    (skipping 0xFF00 stuffing and RSTn markers)."""
    i = start
    while i + 1 < len(buf):
        if buf[i] == 0xFF:
            nxt = buf[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(buf)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (h, w, 3) uint8 RGB (grey
    replicated)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp natural-order int32
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (spec B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htables[(tc_th >> 4, tc_th & 0xF)] = _build_huffman_decode(
                    bits, vals
                )
                p += 17 + nv
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[pq_tq & 0xF] = q.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline (SOF0/1) and "
                "progressive (SOF2) DCT are supported by the pure "
                "decoder"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_sel = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                scan_sel.append({"id": cs, "td": td_ta >> 4, "ta": td_ta & 0xF})
            data_start = pos + seglen
            if not progressive:
                return _decode_scan(
                    buf[data_start:], frame, scan_sel, qtables, htables,
                    restart_interval,
                )
            if frame is None:
                raise ValueError("JPEG SOS before SOF2")
            ss, se, ah_al = seg[1 + 2 * ns : 4 + 2 * ns]
            if coef is None:
                coef = _alloc_coef(frame)
            end = _entropy_end(buf, data_start)
            _decode_prog_scan(
                buf[data_start:end], frame, scan_sel, htables,
                restart_interval, coef, ss, se, ah_al >> 4, ah_al & 0xF,
            )
            pos = end
            continue
        pos += seglen
    if progressive and coef is not None:
        return _reconstruct(frame, coef, qtables)
    raise ValueError("JPEG: no SOS marker found")


def _mcu_geometry(frame):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coef(frame) -> list[np.ndarray]:
    """Per-component (blocks_y, blocks_x, 64) int32 coefficient store
    in NATURAL (row-major) order, MCU-padded so interleaved scans can
    write their padding blocks."""
    _, _, mcux, mcuy = _mcu_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _comp_blocks(frame, ci) -> tuple[int, int]:
    """Non-interleaved scan coverage (spec A.2.2): ceil(comp_dims/8)
    where comp dims = ceil(image_dims * sampling / max_sampling)."""
    hmax, vmax, _, _ = _mcu_geometry(frame)
    c = frame["comps"][ci]
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    chh = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _decode_prog_scan(
    data, frame, scan_sel, htables, restart_interval, coef, ss, se, ah, al
):
    """One progressive scan (T.81 Annex G.2) accumulated into `coef`.

    Four scan kinds: DC first (Ss=0, Ah=0 — baseline DC coding of
    dc>>Al, arithmetic shift), DC refinement (Ah>0 — one bit per
    block, OR-ed at position Al; two's-complement OR is exact for
    negative values because the first pass stored (v>>Al)<<Al), AC
    first (Ss>0, Ah=0 — runs + EOB-run bands, magnitudes scaled by
    <<Al), and AC refinement (the libjpeg-shape correction-bit walk:
    every already-nonzero coefficient in the band consumes one bit
    whenever the position pointer crosses it)."""
    if (ss == 0) != (se == 0) or se > 63 or ss > se:
        # progressive scans are DC-only (Ss=Se=0) or an AC band
        # starting past DC (spec G.1.1.1.1)
        raise ValueError(
            f"invalid progressive spectral selection Ss={ss} Se={se}"
        )
    by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
    sel = [
        (by_id[s["id"]], s["td"], s["ta"]) for s in scan_sel
    ]
    reader = _BitReader(data)
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    if ss == 0 and len(sel) >= 1:
        # DC scan — interleaved in MCU order (or single-comp blocks)
        hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
        pred = [0] * len(frame["comps"])
        if len(sel) > 1 or len(frame["comps"]) == 1:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for ci, td, _ta in sel:
                        c = frame["comps"][ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit.append(
                                    (ci, td, my * c["v"] + by,
                                     mx * c["h"] + bx)
                                )
                    units.append(unit)
        else:
            ci, td, _ta = sel[0]
            nby, nbx = _comp_blocks(frame, ci)
            units = [
                [(ci, td, by, bx)]
                for by in range(nby)
                for bx in range(nbx)
            ]
        for ui, unit in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(frame["comps"])
            for ci, td, by, bx in unit:
                if ah == 0:
                    t = reader.decode_symbol(htables[(0, td)])
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    pred[ci] += diff
                    coef[ci][by, bx, 0] = pred[ci] << al
                else:
                    if reader.read_bit():
                        coef[ci][by, bx, 0] |= p1
        return
    # AC scan — always single component (spec G.1.1.1.1)
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    ci, _td, ta = sel[0]
    ac_t = htables[(1, ta)]
    nby, nbx = _comp_blocks(frame, ci)
    nat = [int(ZIGZAG[k]) for k in range(64)]
    bi = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and bi and bi % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            bi += 1
            block = coef[ci][by, bx]
            if ah == 0:
                # AC first scan (G.2.2)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(ac_t)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC band overflow")
                    block[nat[k]] = (
                        _extend(reader.read_bits(s), s) << al
                    )
                    k += 1
            else:
                # AC refinement scan (G.2.3 / libjpeg AC_refine shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_symbol(ac_t)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad JPEG refinement magnitude"
                                )
                            val = p1 if reader.read_bit() else m1
                        while k <= se:
                            pos_n = nat[k]
                            if block[pos_n] != 0:
                                if reader.read_bit():
                                    if (block[pos_n] & p1) == 0:
                                        block[pos_n] += (
                                            p1 if block[pos_n] >= 0 else m1
                                        )
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            block[nat[k]] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        pos_n = nat[k]
                        if block[pos_n] != 0:
                            if reader.read_bit():
                                if (block[pos_n] & p1) == 0:
                                    block[pos_n] += (
                                        p1 if block[pos_n] >= 0 else m1
                                    )
                        k += 1
                    eobrun -= 1


def _reconstruct(frame, coef, qtables) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients —
    identical algebra to the baseline path."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    idct_m, idct_mt = _DCT_M, _DCT_M.T
    full = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]].ravel()
        nby, nbx = coef[ci].shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                block = (coef[ci][by, bx].astype(np.float64) * q).reshape(
                    8, 8
                )
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct_mt @ block @ idct_m + 128.0
                )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, hmax // c["h"], axis=1),
                vmax // c["v"],
                axis=0,
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _decode_scan(data, frame, scan_sel, qtables, htables, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    if len(scan_sel) != len(frame["comps"]):
        raise NotImplementedError(
            "non-interleaved JPEG scans (one component per SOS) are "
            "not supported by the pure decoder — baseline interleaved "
            "only"
        )
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sel in scan_sel:
        by_id[sel["id"]]["td"] = sel["td"]
        by_id[sel["id"]]["ta"] = sel["ta"]
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data)
    pred = [0] * len(comps)
    mcu_count = 0
    idct_m, idct_mt = _DCT_M, _DCT_M.T
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qtables[c["tq"]]
                dc_t = htables[(0, c["td"])]
                ac_t = htables[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_t)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs
                        block = block.reshape(8, 8) * q
                        px = idct_mt @ block @ idct_m + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category t, t-bit magnitude code) for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _quantize_planes(arr: np.ndarray, quality: int, subsample: bool):
    """Shared color-transform + pad + DCT + quantization for both
    encoders: returns (h, w, sampling, qmats, qcoef) where qcoef[ci]
    is an (nby, nbx, 64) int64 array of quantized coefficients in
    NATURAL (row-major) order.  Baseline and progressive encode the
    SAME quantized coefficients, so their decodes are bit-identical —
    the property tests/test_jpeg.py pins."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("encode_jpeg writes RGB (h, w, 3) only")
    rf = a[:, :, 0].astype(np.float64)
    gf = a[:, :, 1].astype(np.float64)
    bf = a[:, :, 2].astype(np.float64)
    y = 0.299 * rf + 0.587 * gf + 0.114 * bf
    cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
    cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
    lq = _quality_scale(STD_LUMA_Q, quality).reshape(8, 8)
    cq = _quality_scale(STD_CHROMA_Q, quality).reshape(8, 8)
    if subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
        he = (h + 15) // 16 * 16
        we = (w + 15) // 16 * 16
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        he = (h + 7) // 8 * 8
        we = (w + 7) // 8 * 8

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample:
        cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2]
              + cb[1::2, 1::2]) / 4.0
        cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2]
              + cr[1::2, 1::2]) / 4.0
    planes = [y, cb, cr]
    qmats = [lq, cq, cq]
    m, mt = _DCT_M, _DCT_M.T
    qcoef = []
    for ci in range(3):
        p = planes[ci]
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        out = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qc = np.round((m @ blk @ mt) / qmats[ci]).astype(np.int64)
                out[by, bx] = qc.ravel()
        qcoef.append(out)
    return h, w, sampling, qmats, qcoef


def _jfif_header(h, w, sampling, qmats, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOF + DHT segments (shared by both
    encoders; only the SOF marker differs)."""
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    lq, cq = qmats[0], qmats[1]
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in ((0, lq), (1, cq)):
        zzq = np.zeros(64, dtype=np.uint8)
        zzq[np.arange(64)] = q.ravel()[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zzq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += seg(sof_marker, sof)
    for tc_th, (bits, vals) in (
        (0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA),
        (0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    return out


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """RGB (h, w, 3) uint8 → baseline JFIF JPEG bytes. `subsample`
    writes 4:2:0 chroma (the common camera/web layout); default 4:4:4."""
    h, w, sampling, qmats, qcoef = _quantize_planes(arr, quality, subsample)
    dc_enc = [
        _build_huffman_encode(*STD_DC_LUMA),
        _build_huffman_encode(*STD_DC_CHROMA),
        _build_huffman_encode(*STD_DC_CHROMA),
    ]
    ac_enc = [
        _build_huffman_encode(*STD_AC_LUMA),
        _build_huffman_encode(*STD_AC_CHROMA),
        _build_huffman_encode(*STD_AC_CHROMA),
    ]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcuy = qcoef[0].shape[0] // sampling[0][1]
    mcux = qcoef[0].shape[1] // sampling[0][0]
    writer = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = qcoef[ci][my * sv + by, mx * sh + bx][ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, code = _mag_bits(diff)
                        hc, hl = dc_enc[ci][t]
                        writer.write(hc, hl)
                        if t:
                            writer.write(code, t)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                hc, hl = ac_enc[ci][0xF0]  # ZRL
                                writer.write(hc, hl)
                                run -= 16
                            t, code = _mag_bits(v)
                            hc, hl = ac_enc[ci][(run << 4) | t]
                            writer.write(hc, hl)
                            writer.write(code, t)
                            run = 0
                            if k == last_nz:
                                break
                        if last_nz < 63:
                            hc, hl = ac_enc[ci][0x00]  # EOB
                            writer.write(hc, hl)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = _jfif_header(h, w, sampling, qmats, 0xC0)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """RGB (h, w, 3) uint8 → progressive (SOF2) JFIF JPEG bytes.

    The standard simple scan script — DC first for all components
    interleaved at Al=1, per-component AC first (band 1..63) at Al=1,
    then DC and AC refinement scans down to Al=0 — so every decoder
    path (interleaved DC, EOB bands, ZRL-in-refinement, correction
    bits) is exercised.  Quantized coefficients come from the SAME
    `_quantize_planes` as the baseline encoder, so decoding this
    stream yields bit-identical pixels to decoding
    `encode_jpeg(arr, quality, subsample)`.

    DC scans use the spec's arithmetic shift (two's complement); AC
    scans use sign-magnitude shift (G.1.2.2/G.1.2.3) — mirrored
    exactly by the decoder's `<< Al` / correction-bit algebra.
    Standard Annex-K tables carry no EOB-run symbols beyond 0x00, so
    every end-of-band is a run of exactly one block (valid, just not
    maximally compressed — this is a fixture encoder)."""
    h, w, sampling, qmats, qcoef = _quantize_planes(arr, quality, subsample)
    dc_enc = [
        _build_huffman_encode(*STD_DC_LUMA),
        _build_huffman_encode(*STD_DC_CHROMA),
        _build_huffman_encode(*STD_DC_CHROMA),
    ]
    ac_enc = [
        _build_huffman_encode(*STD_AC_LUMA),
        _build_huffman_encode(*STD_AC_CHROMA),
        _build_huffman_encode(*STD_AC_CHROMA),
    ]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcuy = qcoef[0].shape[0] // sampling[0][1]
    mcux = qcoef[0].shape[1] // sampling[0][0]
    nat = [int(ZIGZAG[k]) for k in range(64)]

    def comp_blocks(ci: int) -> tuple[int, int]:
        sh, sv = sampling[ci]
        cw = (w * sh + hmax - 1) // hmax
        chh = (h * sv + vmax - 1) // vmax
        return (chh + 7) // 8, (cw + 7) // 8

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(comps: list[int], tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for i, ci in enumerate(comps):
            body += bytes([ci + 1, (tds[i] << 4) | tas[i]])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = _jfif_header(h, w, sampling, qmats, 0xC2)

    # ---- scan 1: DC first, interleaved, Ah=0 Al=1 (arithmetic shift)
    writer = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(qcoef[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        t, code = _mag_bits(diff)
                        hc, hl = dc_enc[ci][t]
                        writer.write(hc, hl)
                        if t:
                            writer.write(code, t)
    writer.flush()
    out += sos([0, 1, 2], [0, 1, 1], [0, 0, 0], 0, 0, 0, 1)
    out += writer.out

    # ---- scans 2-4: AC first per component, band 1..63, Ah=0 Al=1
    # (sign-magnitude shift toward zero)
    for ci in range(3):
        writer = _BitWriter()
        nby, nbx = comp_blocks(ci)
        for by in range(nby):
            for bx in range(nbx):
                block = qcoef[ci][by, bx]
                r = 0
                wrote = False
                for k in range(1, 64):
                    v = int(block[nat[k]])
                    sm = (abs(v) >> 1) * (1 if v >= 0 else -1)
                    if sm == 0:
                        r += 1
                        continue
                    while r > 15:
                        hc, hl = ac_enc[ci][0xF0]
                        writer.write(hc, hl)
                        r -= 16
                    t, code = _mag_bits(sm)
                    hc, hl = ac_enc[ci][(r << 4) | t]
                    writer.write(hc, hl)
                    writer.write(code, t)
                    r = 0
                    wrote = True
                if r > 0 or not wrote:
                    hc, hl = ac_enc[ci][0x00]  # EOB (run of 1)
                    writer.write(hc, hl)
        writer.flush()
        out += sos([ci], [0], [0 if ci == 0 else 1], 1, 63, 0, 1)
        out += writer.out

    # ---- scan 5: DC refinement, interleaved, Ah=1 Al=0 (raw bits)
    writer = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(qcoef[ci][my * sv + by, mx * sh + bx, 0])
                        writer.write(v & 1, 1)
    writer.flush()
    out += sos([0, 1, 2], [0, 1, 1], [0, 0, 0], 0, 0, 1, 0)
    out += writer.out

    # ---- scans 6-8: AC refinement per component, Ah=1 Al=0
    # (libjpeg encode_mcu_AC_refine shape: ZRL flush at every nonzero
    # visit while k <= EOB; correction bits buffered until the next
    # symbol; per-block EOB carries the tail bits)
    for ci in range(3):
        writer = _BitWriter()
        nby, nbx = comp_blocks(ci)
        for by in range(nby):
            for bx in range(nbx):
                block = qcoef[ci][by, bx]
                absv = [abs(int(block[nat[k]])) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                r = 0
                pending: list[int] = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        hc, hl = ac_enc[ci][0xF0]
                        writer.write(hc, hl)
                        r -= 16
                        for b in pending:
                            writer.write(b, 1)
                        pending = []
                    if t > 1:
                        pending.append(t & 1)
                        continue
                    hc, hl = ac_enc[ci][(r << 4) | 1]
                    writer.write(hc, hl)
                    v = int(block[nat[k]])
                    writer.write(1 if v > 0 else 0, 1)
                    for b in pending:
                        writer.write(b, 1)
                    pending = []
                    r = 0
                if r > 0 or pending:
                    hc, hl = ac_enc[ci][0x00]
                    writer.write(hc, hl)
                    for b in pending:
                        writer.write(b, 1)
        writer.flush()
        out += sos([ci], [0], [0 if ci == 0 else 1], 1, 63, 1, 0)
        out += writer.out

    out += b"\xff\xd9"
    return bytes(out)
