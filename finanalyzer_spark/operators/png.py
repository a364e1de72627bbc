"""PNG (ISO/IEC 15948 / RFC 2083, W3C PNG spec) — lossless image
codec in pure python + stdlib zlib + numpy.

Why this format is in the tier: PNG is the single most common lossless
image format in web corpora (the reference's multimodal ambition,
/root/reference/finanalyzer/README.md), and the whole normative
surface is small: chunk framing with CRC-32, one DEFLATE stream
(stdlib ``zlib`` — itself an independent, conformant implementation),
five byte-level scanline filters, palette indexing, and the fixed
Adam7 interlace grid.  There are no entropy-coding tables to
transcribe, so the CABAC-style closed-loop risk (SCALE.md) does not
apply: the only hand-written arithmetic is the filter/Paeth algebra
and the interlace geometry, both certified in tests/test_png.py by

  * genuinely foreign files (CPython-distribution PNGs written by
    external tools: palette+tRNS and RGBA, single- and multi-IDAT),
  * a CROSS-FORMAT check — the stdlib ships the same 16x16 logo as
    both ``python.png`` (palette) and ``python.tiff`` (RGBA, decoded
    by the independent operators/tiff.py path); both decodes must
    agree pixel-for-pixel,
  * hand-assembled spec vectors (every filter type, Adam7) with
    hand-computed pixels, and
  * encoder-twin round trips plus fail-closed garbage behavior.

Decode supports the full baseline matrix: color types 0/2/3/4/6, bit
depths 1/2/4/8/16 (in their spec-legal combinations), interlace 0 and
Adam7, multi-IDAT, CRC-verified chunks.  Exact-or-refuse: anything
outside the spec-legal matrix (or a tRNS colour-key on non-palette
images, which would silently change the channel count) raises instead
of guessing.

Layout (spec §5, §11):
  signature  89 50 4E 47 0D 0A 1A 0A
  chunks     length u32be | type 4 bytes | data | crc32(type+data)
  IHDR       width u32be, height u32be, bit depth u8, colour type u8,
             compression u8 (=0), filter u8 (=0), interlace u8 (0|1)
  scanlines  filter byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth)
             then ceil(w * channels * depth / 8) bytes
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# spec-legal bit depths per colour type (spec Table 11.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass geometry: (x_start, y_start, x_step, y_step), spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §9.4): nearest of left/up/up-left to
    a + b - c, ties resolved left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse the per-scanline filters; returns h*stride bytes."""
    import numpy as np

    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: filtered data length mismatch")
    out = bytearray(h * stride)
    prev = bytes(stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8)
                 + np.frombuffer(prev, dtype=np.uint8)).tobytes()
            )
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return bytes(out)


def _unpack_samples(rows: bytes, h: int, w: int, ch: int, depth: int):
    """h rows of packed samples -> (h, w*ch) int array."""
    import numpy as np

    stride = (w * ch * depth + 7) // 8
    arr = np.frombuffer(rows, dtype=np.uint8).reshape(h, stride)
    if depth == 8:
        return arr[:, : w * ch].astype(np.uint16)
    if depth == 16:
        # stride == w*ch*2 exactly, big-endian sample pairs
        return (
            np.frombuffer(rows, dtype=">u2")
            .reshape(h, w * ch)
            .astype(np.uint16)
        )
    # sub-byte depths: big-endian bit packing within each byte
    bits = np.unpackbits(arr, axis=1)
    n = w * ch
    vals = np.zeros((h, n), dtype=np.uint16)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b::depth][:, :n]
    return vals


def decode_png(buf: bytes):
    """Decode a PNG byte stream to an (h, w, ch) numpy array.

    uint8 for depths <= 8 (sub-byte gray depths are left as raw
    sample values, NOT rescaled, so palette indices and gray levels
    stay exact); uint16 for depth 16.  Palette images expand to RGB,
    or RGBA when a tRNS chunk is present.  CRCs are verified;
    malformed or out-of-matrix streams raise (exact-or-refuse).
    """
    import numpy as np

    if buf[:8] != _SIG:
        raise ValueError("PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    seen_iend = False
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("PNG: truncated chunk header")
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(buf):
            raise ValueError("PNG: truncated chunk body")
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + ln : pos + 12 + ln]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("PNG: PLTE length not divisible by 3")
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (gAMA, cHRM, bKGD, pHYs, tEXt, tIME, ...)
        # carry no pixel data and are skipped after CRC verification
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    if not seen_iend:
        raise ValueError("PNG: missing IEND")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG: unknown colour type {ctype}")
    if depth not in _LEGAL_DEPTHS[ctype]:
        raise ValueError(
            f"PNG: illegal depth {depth} for colour type {ctype}"
        )
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    if trns is not None and ctype in (0, 2):
        # colour-key transparency would change the channel count
        # behind the caller's back; refuse rather than guess
        raise NotImplementedError(
            "PNG: tRNS colour key on non-palette image"
        )
    if trns is not None and ctype in (4, 6):
        raise ValueError("PNG: tRNS forbidden with alpha colour types")
    ch = _CHANNELS[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: bad DEFLATE stream: {e}") from None

    def read_subimage(raw_part: bytes, sw: int, sh: int):
        stride = (sw * ch * depth + 7) // 8
        bpp = max(1, (ch * depth) // 8)
        rows = _unfilter(raw_part, sh, stride, bpp)
        return _unpack_samples(rows, sh, sw, ch, depth)

    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG: decompressed size mismatch")
        samples = read_subimage(raw, w, h)
    elif interlace == 1:
        samples = np.zeros((h, w * ch), dtype=np.uint16)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            sw = (w - x0 + dx - 1) // dx
            sh = (h - y0 + dy - 1) // dy
            if sw == 0 or sh == 0:
                continue
            stride = (sw * ch * depth + 7) // 8
            need = sh * (stride + 1)
            part = raw[off : off + need]
            off += need
            sub = read_subimage(part, sw, sh)
            sub3 = sub.reshape(sh, sw, ch)
            ys = np.arange(y0, h, dy)
            xs = np.arange(x0, w, dx)
            full = samples.reshape(h, w, ch)
            full[np.ix_(ys, xs)] = sub3
        if off != len(raw):
            raise ValueError("PNG: interlaced size mismatch")
        samples = samples.reshape(h, -1)
    else:
        raise ValueError(f"PNG: unknown interlace method {interlace}")

    if ctype == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples.reshape(h, w)
        if idx.max() >= pal.shape[0]:
            raise ValueError("PNG: palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
            t = np.frombuffer(trns, dtype=np.uint8)
            if len(t) > pal.shape[0]:
                raise ValueError("PNG: tRNS longer than palette")
            alpha[: len(t)] = t
            return np.dstack([rgb, alpha[idx]])
        return rgb
    out = samples.reshape(h, w, ch)
    return out.astype(np.uint16) if depth == 16 else out.astype(
        np.uint8
    )


def _filter_line(line, prev, bpp: int, ft: int) -> bytes:
    import numpy as np

    line = np.asarray(line, dtype=np.int16)
    prev = np.asarray(prev, dtype=np.int16)
    left = np.zeros_like(line)
    left[bpp:] = line[:-bpp]
    ul = np.zeros_like(prev)
    ul[bpp:] = prev[:-bpp]
    if ft == 0:
        res = line
    elif ft == 1:
        res = line - left
    elif ft == 2:
        res = line - prev
    elif ft == 3:
        res = line - ((left + prev) >> 1)
    else:
        p = left + prev - ul
        pa, pb, pc = (
            np.abs(p - left),
            np.abs(p - prev),
            np.abs(p - ul),
        )
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
        )
        res = line - pred
    return (res & 0xFF).astype("uint8").tobytes()


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img, level: int = 9) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array (ch in 1..4 ->
    colour types 0/4/2/6) or uint16 (depth 16) as a non-interlaced
    PNG.  Deterministic: per-row filter chosen by the standard
    minimum-sum-of-absolute-residuals heuristic, fixed zlib level."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError("PNG encodes (h, w, 1|2|3|4) arrays")
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError("PNG encodes uint8 or uint16 arrays")
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * depth // 8
    if depth == 16:
        rows = img.astype(">u2").tobytes()
    else:
        rows = img.tobytes()
    stride = w * bpp
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = rows[y * stride : (y + 1) * stride]
        la = np.frombuffer(line, dtype=np.uint8)
        pa = np.frombuffer(prev, dtype=np.uint8)
        best, best_cost = None, None
        for ft in range(5):
            cand = _filter_line(la, pa, bpp, ft)
            ca = np.frombuffer(cand, dtype=np.uint8).astype(np.int16)
            cost = int(np.minimum(ca, 256 - ca).sum())
            if best_cost is None or cost < best_cost:
                best, best_cost, best_ft = cand, cost, ft
        out.append(best_ft)
        out += best
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )
