"""Pure-python FLAC codec (decode + encoder twin), 16-bit PCM.

Round 7 extends the audio tier beyond WAV: FLAC is the dominant
lossless format in crawled audio, and LOSSLESSNESS makes it the
lowest-risk codec in the repo — decode(encode(x)) == x exactly, no
quantisation, no transcribed VLC tables (Rice coding is
parameterised), and the container's own integrity machinery (CRC-8
per frame header, CRC-16 per frame, MD5 of the raw samples in
STREAMINFO) gives three independent checksums the decoder verifies.

Decoder coverage (what real encoders emit):
* STREAMINFO + any other metadata blocks (skipped by length);
* fixed- and variable-blocksize frames, all blocksize/sample-rate/
  sample-size header codes incl. the end-of-header 8/16-bit forms;
* subframes CONSTANT, VERBATIM, FIXED order 0-4, and LPC any order
  (qlp precision/shift, signed coefficients);
* partitioned Rice residuals, both the 4-bit and 5-bit parameter
  methods, incl. the raw-bits escape partitions;
* wasted-bits shifting;
* all four channel assignments (independent, left/side, right/side,
  mid/side).
Anything outside 16-bit PCM (8/12/20/24/32-bit streams) raises
NotImplementedError naming the sample size — exact-or-refuse, same
discipline as the H.264 tiers.

Encoder twin `encode_flac`: 16-bit mono/stereo, fixed predictors
(best order 0-4 by residual magnitude) plus quantised-LPC subframes
(Levinson-Durbin, order <= max_lpc_order, taken when they clearly
beat the fixed predictors; 0 disables), per-partition Rice parameter
estimation with partition order chosen per frame, mid/side vs
independent stereo decision per frame, CRC-8/CRC-16/MD5 all real.
The twin exists to prove the decoder against bit-exact round trips —
and because its output is spec-valid, any conformant decoder plays
it (env-gated cross-check in tests when soundfile/PyAV exist).

Spec grounding: RFC 9639 (FLAC; formerly the xiph.org spec) —
§9.1 frame header codes, §9.2 subframe types, §9.2.7 coded
residual, §10 CRC polynomials (CRC-8 poly 0x07, CRC-16 poly
0x8005, both init 0).  Reference context: the reference repo has no
media surface — extended training-data-pipeline tier.
"""

from __future__ import annotations

import hashlib
import struct

#: fixed-predictor coefficient rows, order 0..4 (RFC 9639 §9.2.5)
_FIXED_COEFFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]


def _np():
    import numpy as np

    return np


def crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 (RFC 9639 §10)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (RFC 9639 §10)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over bytes, with byte-position access for
    the CRC spans."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bit = pos * 8

    @property
    def byte_pos(self) -> int:
        return self.bit >> 3

    def u(self, n: int) -> int:
        if self.bit + n > 8 * len(self.data):
            raise ValueError("truncated FLAC stream")
        v = 0
        for _ in range(n):
            v = (v << 1) | (
                (self.data[self.bit >> 3] >> (7 - (self.bit & 7))) & 1
            )
            self.bit += 1
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.bit = (self.bit + 7) & ~7


class _BitsW:
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

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style frame/sample number coding (§9.1.5)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(r: _Bits) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.u(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def parse_streaminfo(buf: bytes) -> dict:
    """Parse the mandatory STREAMINFO block; ValueError on non-FLAC
    payloads so probes can route elsewhere."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated FLAC metadata")
        header = buf[pos]
        last = header >> 7
        btype = header & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _Bits(body)
            info = {
                "min_blocksize": r.u(16),
                "max_blocksize": r.u(16),
                "min_framesize": r.u(24),
                "max_framesize": r.u(24),
                "sample_rate": r.u(20),
                "channels": r.u(3) + 1,
                "bits_per_sample": r.u(5) + 1,
                "total_samples": r.u(36),
                "md5": body[18:34],
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    info["frames_offset"] = pos
    return info


_BLOCKSIZE_FROM_CODE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048,
    0b1100: 4096, 0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_RATE_FROM_CODE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BPS_FROM_CODE = {
    0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32,
}
_CODE_FROM_SAMPLE_RATE = {v: k for k, v in _SAMPLE_RATE_FROM_CODE.items()}


def _decode_residual(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.u(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.u(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC partition order does not divide blocksize")
    out = []
    for p in range(n_part):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("invalid FLAC partition order")
        param = r.u(pbits)
        if param == escape:
            raw = r.u(5)
            for _ in range(count):
                out.append(r.s(raw) if raw else 0)
        else:
            for _ in range(count):
                q = r.unary()
                v = (q << param) | r.u(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(r: _Bits, blocksize: int, bps: int) -> list[int]:
    if r.u(1):
        raise ValueError("invalid subframe padding bit")
    stype = r.u(6)
    wasted = 0
    if r.u(1):  # wasted bits flag
        wasted = 1 + r.unary()
    eff = bps - wasted
    if stype == 0b000000:  # CONSTANT
        v = r.s(eff)
        samples = [v] * blocksize
    elif stype == 0b000001:  # VERBATIM
        samples = [r.s(eff) for _ in range(blocksize)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED, order 0..4
        order = stype & 0x07
        warm = [r.s(eff) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        samples = list(warm)
        coeffs = _FIXED_COEFFS[order]
        for e in resid:
            pred = sum(
                c * samples[-1 - i] for i, c in enumerate(coeffs)
            )
            samples.append(e + pred)
    elif stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        warm = [r.s(eff) for _ in range(order)]
        precision = r.u(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC qlp precision")
        shift = r.s(5)
        if shift < 0:
            raise ValueError("negative FLAC qlp shift")
        coeffs = [r.s(precision) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        samples = list(warm)
        for e in resid:
            acc = sum(c * samples[-1 - i] for i, c in enumerate(coeffs))
            samples.append(e + (acc >> shift))
    else:
        raise ValueError("reserved FLAC subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(buf: bytes):
    """Decode a FLAC stream → (streaminfo dict, samples) where
    samples is an int32 numpy array of shape (n, channels).  Verifies
    every frame-header CRC-8, every frame CRC-16, and the STREAMINFO
    MD5 (when present).  16-bit PCM only; other depths refuse."""
    np = _np()
    info = parse_streaminfo(buf)
    if info["bits_per_sample"] != 16:
        raise NotImplementedError(
            f"{info['bits_per_sample']}-bit FLAC needs an external"
            " decoder; the pure tier decodes 16-bit PCM"
        )
    pos = info["frames_offset"]
    channels_out: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(buf):
        if pos + 2 > len(buf):
            break
        r = _Bits(buf, pos)
        sync = r.u(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if r.u(1):
            raise ValueError("reserved frame-header bit set")
        r.u(1)  # blocking strategy (number semantics only)
        bs_code = r.u(4)
        sr_code = r.u(4)
        ch_code = r.u(4)
        bps_code = r.u(3)
        if r.u(1):
            raise ValueError("reserved frame-header bit set")
        _num = _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        if bs_code == 0b0110:
            blocksize = r.u(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.u(16) + 1
        else:
            blocksize = _BLOCKSIZE_FROM_CODE[bs_code]
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code == 0b1100:
            r.u(8)
        elif sr_code in (0b1101, 0b1110):
            r.u(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code")
        bps = (
            info["bits_per_sample"] if bps_code == 0
            else _BPS_FROM_CODE.get(bps_code)
        )
        if bps is None:
            raise ValueError("reserved sample-size code")
        if bps != 16:
            raise NotImplementedError("only 16-bit FLAC frames")
        header_end = r.byte_pos
        if crc8(buf[pos:header_end]) != r.u(8):
            raise ValueError("FLAC frame-header CRC-8 mismatch")

        if ch_code <= 0b0111:
            n_ch = ch_code + 1
            subs = [
                _decode_subframe(r, blocksize, bps) for _ in range(n_ch)
            ]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            n_ch = 2
            # the side channel carries one extra bit of range
            if ch_code == 0b1000:  # left/side
                left = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 0b1001:  # side/right
                side = _decode_subframe(r, blocksize, bps + 1)
                right = _decode_subframe(r, blocksize, bps)
                subs = [[s + rr for s, rr in zip(side, right)], right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                left = [
                    ((m << 1) + (s & 1) + s) >> 1
                    for m, s in zip(mid, side)
                ]
                subs = [left, [l - s for l, s in zip(left, side)]]
        else:
            raise ValueError("reserved channel assignment")
        if n_ch != info["channels"]:
            raise ValueError("frame channel count != STREAMINFO")
        r.align()
        frame_end = r.byte_pos
        if crc16(buf[pos:frame_end]) != r.u(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.byte_pos
        for c in range(n_ch):
            channels_out[c].extend(subs[c])

    samples = np.array(channels_out, dtype=np.int64).T
    if info["total_samples"]:
        samples = samples[: info["total_samples"]]
    if samples.size and (
        samples.max() > 32767 or samples.min() < -32768
    ):
        raise ValueError("decoded FLAC samples exceed 16-bit range")
    if info["md5"] != b"\x00" * 16:
        raw = samples.astype("<i2").tobytes()
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return info, samples.astype(np.int32)


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------
def _best_fixed_order(sig) -> int:
    """Smallest total |residual| among fixed orders 0..4 (the classic
    flake/libFLAC fast heuristic)."""
    np = _np()
    best, best_cost = 0, None
    d = sig.astype(np.int64)
    for order in range(5):
        cost = int(np.abs(d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        d = np.diff(d)
        if len(d) == 0:
            break
    return best


def _rice_param(resid) -> int:
    """Rice parameter from the mean magnitude (standard estimator)."""
    np = _np()
    if len(resid) == 0:
        return 0
    mean = float(np.abs(resid).mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_residual(w: _BitsW, resid, blocksize: int, order: int):
    """Method 00 (4-bit Rice), partition order chosen so partitions
    stay uniform: the largest po with blocksize % 2^po == 0 and
    first-partition count > 0, capped at 4."""
    np = _np()
    porder = 0
    for po in range(4, -1, -1):
        if blocksize % (1 << po) == 0 and (blocksize >> po) > order:
            porder = po
            break
    w.u(0, 2)
    w.u(porder, 4)
    idx = 0
    for p in range(1 << porder):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[idx : idx + count]
        idx += count
        param = min(_rice_param(part), 14)
        zz = [int(v) for v in np.asarray(part, dtype=np.int64)]
        zz = [(v << 1) ^ (v >> 63) if v >= 0 else ((-v << 1) - 1)
              for v in zz]
        # signed bit width the raw escape would need for this part
        need = 1
        for v in part:
            iv = int(v)
            b = max(iv.bit_length() + 1, 2) if iv else 1
            need = max(need, b)
        rice_bits = sum((z >> param) + 1 + param for z in zz)
        raw_bits = 5 + count * need
        if rice_bits > raw_bits and need <= 31:
            # escape partition: 5-bit width then raw signed samples
            w.u(15, 4)
            w.u(need, 5)
            for v in part:
                w.s(int(v), need)
        else:
            w.u(param, 4)
            for z in zz:
                q = z >> param
                if q:
                    w.u(0, q)
                w.u(1, 1)
                if param:
                    w.u(z & ((1 << param) - 1), param)


def _lpc_candidate(sig, max_order: int = 8, precision: int = 12):
    """Quantised-LPC candidate: autocorrelation → Levinson-Durbin →
    coefficient quantisation matching the decoder's integer predictor
    exactly.  Returns (order, shift, qlp, residual) or None when LPC
    is degenerate (flat/short signals)."""
    np = _np()
    n = len(sig)
    if n < max_order * 2 + 1:
        return None
    x = sig.astype(np.float64)
    autoc = [float(np.dot(x[: n - lag], x[lag:])) for lag in
             range(max_order + 1)]
    if autoc[0] == 0.0:
        return None
    # Levinson-Durbin recursion, keeping every order's coefficients —
    # high orders amplify coefficient-quantisation noise, so the best
    # ORDER is an empirical per-block choice, exactly as in libFLAC
    err = autoc[0]
    lpc = [0.0] * max_order
    per_order = []
    for i in range(max_order):
        acc = autoc[i + 1]
        for j in range(i):
            acc -= lpc[j] * autoc[i - j]
        k = acc / err
        new = lpc[:]
        new[i] = k
        for j in range(i):
            new[j] = lpc[j] - k * lpc[i - 1 - j]
        err *= 1.0 - k * k
        lpc = new
        per_order.append(lpc[: i + 1])
        if err <= 0:
            break

    si = np.asarray(sig, dtype=np.int64)
    best = None
    for coefs in per_order:
        order = len(coefs)
        cmax = max(abs(c) for c in coefs)
        if cmax == 0.0 or not np.isfinite(cmax):
            continue
        shift = precision - 1 - max(
            0, int(np.floor(np.log2(cmax))) + 1
        )
        shift = max(0, min(31, shift))
        qlp = [
            int(np.clip(round(c * (1 << shift)),
                        -(1 << (precision - 1)),
                        (1 << (precision - 1)) - 1))
            for c in coefs
        ]
        if all(q == 0 for q in qlp):
            continue
        # integer residual through the decoder's exact predictor,
        # vectorised: acc[i] = sum_j qlp[j] * x[i-1-j]
        acc = np.zeros(n - order, dtype=np.int64)
        for j, q in enumerate(qlp):
            acc += q * si[order - 1 - j : n - 1 - j]
        resid = si[order:] - (acc >> shift)
        cost = int(np.abs(resid).sum())
        if best is None or cost < best[0]:
            best = (cost, order, shift, qlp, [int(v) for v in resid])
    if best is None:
        return None
    _cost, order, shift, qlp, resid = best
    return order, shift, qlp, resid


def _encode_subframe(w: _BitsW, sig, bps: int, max_lpc_order: int = 8):
    """Best of CONSTANT / FIXED(0-4) / quantised-LPC by residual
    magnitude (CONSTANT when flat), through the decoder's exact
    integer prediction either way."""
    np = _np()
    sig = np.asarray(sig, dtype=np.int64)
    if len(sig) and (sig == sig[0]).all():
        w.u(0, 1)
        w.u(0b000000, 6)
        w.u(0, 1)  # no wasted bits
        w.s(int(sig[0]), bps)
        return
    order = _best_fixed_order(sig)
    order = min(order, len(sig))
    d = sig
    for _ in range(order):
        d = np.diff(d)
    fixed_cost = int(np.abs(d).sum())
    lpc = (
        _lpc_candidate(sig, max_order=max_lpc_order)
        if max_lpc_order > 0
        else None
    )
    if lpc is not None:
        lorder, shift, qlp, lresid = lpc
        lpc_cost = int(np.abs(np.asarray(lresid, dtype=np.int64)).sum())
        # LPC pays ~ (order * precision + 9) header bits more; demand
        # a real win before taking it
        if lpc_cost + lpc_cost // 8 < fixed_cost:
            w.u(0, 1)
            w.u(0b100000 | (lorder - 1), 6)
            w.u(0, 1)  # no wasted bits
            for v in sig[:lorder]:
                w.s(int(v), bps)
            w.u(12 - 1, 4)   # qlp precision
            w.s(shift, 5)
            for q in qlp:
                w.s(q, 12)
            _write_residual(w, lresid, len(sig), lorder)
            return
    w.u(0, 1)
    w.u(0b001000 | order, 6)
    w.u(0, 1)  # no wasted bits
    for v in sig[:order]:
        w.s(int(v), bps)
    _write_residual(w, d, len(sig), order)


def encode_flac(
    samples,
    sample_rate: int = 16000,
    blocksize: int = 1024,
    max_lpc_order: int = 8,
) -> bytes:
    """Encoder twin: 16-bit PCM (n,) mono or (n, 2) stereo →
    spec-valid FLAC (fixed blocksize, FIXED/CONSTANT subframes,
    per-frame mid/side vs independent stereo decision, real
    CRC-8/CRC-16/MD5).  Lossless: decode_flac(encode_flac(x)) == x."""
    np = _np()
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, n_ch = arr.shape
    if n_ch not in (1, 2):
        raise ValueError("encode_flac handles mono or stereo")
    if n == 0:
        raise ValueError("need at least one sample")
    if arr.max() > 32767 or arr.min() < -32768:
        raise ValueError("samples exceed 16-bit range")
    if not 1 <= blocksize <= 65536:
        raise ValueError("blocksize out of range")

    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()
    si = _BitsW()
    si.u(blocksize, 16)
    si.u(blocksize, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(sample_rate, 20)
    si.u(n_ch - 1, 3)
    si.u(15, 5)  # bits_per_sample - 1
    si.u(n & ((1 << 36) - 1), 36)
    streaminfo = bytes(si.out) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo

    for fno, start in enumerate(range(0, n, blocksize)):
        block = arr[start : start + blocksize]
        bs = len(block)
        w = _BitsW()
        w.u(0b11111111111110, 14)
        w.u(0, 1)
        w.u(0, 1)  # fixed blocksize strategy
        # always use the end-of-header 16-bit blocksize form — it is
        # always legal and exercises that decode path
        w.u(0b0111, 4)
        w.u(_CODE_FROM_SAMPLE_RATE.get(sample_rate, 0), 4)
        # channel assignment: mono/independent stereo or mid/side,
        # whichever codes the smaller total magnitude this frame
        midside = False
        if n_ch == 2 and bs > 1:
            l = block[:, 0]
            rr = block[:, 1]
            mid = (l + rr) >> 1
            side = l - rr
            cost_ind = int(np.abs(np.diff(l)).sum()) + int(
                np.abs(np.diff(rr)).sum()
            )
            cost_ms = int(np.abs(np.diff(mid)).sum()) + int(
                np.abs(np.diff(side)).sum()
            )
            midside = cost_ms < cost_ind
        w.u(0b1010 if midside else n_ch - 1, 4)
        w.u(0b100, 3)  # 16-bit
        w.u(0, 1)
        for b in _utf8_coded(fno):
            w.u(b, 8)
        w.u(bs - 1, 16)
        w.align()
        header = bytes(w.out)
        w.u(crc8(header), 8)
        if midside:
            mid = (block[:, 0] + block[:, 1]) >> 1
            side = block[:, 0] - block[:, 1]
            _encode_subframe(w, mid, 16, max_lpc_order)
            _encode_subframe(w, side, 17, max_lpc_order)
        else:
            for c in range(n_ch):
                _encode_subframe(w, block[:, c], 16, max_lpc_order)
        w.align()
        frame = bytes(w.out)
        w.u(crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)
