"""Legacy raster image formats: Sun Raster, SGI RGB, PNM (P1-P6), XBM.

Pure-python + numpy decoders (and encoder twins for the two
RLE-bearing formats) for the classic Unix-era image families a web
crawl still surfaces, extending the media tier's image matrix (PPM /
BMP / PNG / QOI / TIFF / GIF / JPEG) with formats certified against
**genuinely foreign stdlib fixtures**: CPython's `imghdrdata/python.*`
files carry the same 16x16 logo in every format, written by external
tools, so tests cross-check decoders pixel-for-pixel against the
already-foreign-certified PNG/TIFF decode (tests/test_legacyimg.py).

Formats (all public specs):
- Sun Raster (`ras`): 8 x int32 BE header; RT_STANDARD (BGR),
  RT_BYTE_ENCODED (0x80-marker RLE), RT_FORMAT_RGB; depths 1/8/24/32,
  optional RGB colormap, rows padded to 16 bits.
- SGI image (`sgi`, a.k.a. RGB/RGBA): 512-byte BE header, verbatim or
  RLE storage (per-scanline offset tables), bottom-up rows, planar
  channels, 1 byte per channel.
- PNM: P1/P2/P3 ASCII and P4/P5/P6 raw bitmap/gray/RGB with maxval
  scaling and header comments.
- XBM: the C-source bitmap text format (LSB-first bits, set = ink).

Exact-or-refuse: unsupported depths/storage raise
NotImplementedError; malformed payloads raise ValueError."""

from __future__ import annotations

import re
import struct

import numpy as np

_RAS_MAGIC = 0x59A66A95


def _ras_unrle(data: bytes, expected: int) -> bytes:
    """Sun RT_BYTE_ENCODED: 0x80 <count> <byte> runs of count+1;
    0x80 0x00 is a literal 0x80; other bytes literal."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        if b != 0x80:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        cnt = data[i + 1]
        if cnt == 0:
            out.append(0x80)
            i += 2
        else:
            if i + 2 >= n:
                raise ValueError("Sun Raster RLE run truncated")
            out.extend(bytes([data[i + 2]]) * (cnt + 1))
            i += 3
    if len(out) < expected:
        raise ValueError("Sun Raster RLE output short")
    return bytes(out[:expected])


def _ras_rle(data: bytes) -> bytes:
    """Encoder twin of _ras_unrle (maximal runs, 0x80 escaped)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n and j - i < 256 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3 or (run >= 2 and data[i] == 0x80):
            out.extend((0x80, run - 1, data[i]))
        else:
            for k in range(i, j):
                if data[k] == 0x80:
                    out.extend((0x80, 0x00))
                else:
                    out.append(data[k])
        i = j
    return bytes(out)


def decode_ras(buf: bytes):
    """Sun Raster -> numpy image. Returns (h, w, 3) uint8 RGB for
    depth 1/8/24 and (h, w, 4) RGBA for depth 32 (the pad/alpha byte
    mapped last regardless of the stored xBGR/xRGB order)."""
    if len(buf) < 32:
        raise ValueError("Sun Raster header truncated")
    magic, w, h, depth, length, rtype, maptype, maplen = struct.unpack(
        ">8i", buf[:32]
    )
    if magic != _RAS_MAGIC:
        raise ValueError("not a Sun Raster payload")
    if rtype not in (0, 1, 2, 3):
        raise NotImplementedError(f"Sun Raster type {rtype} not supported")
    if depth not in (1, 8, 24, 32):
        raise NotImplementedError(f"Sun Raster depth {depth} not supported")
    if w <= 0 or h <= 0:
        raise ValueError("Sun Raster declares empty image")
    pos = 32
    cmap = None
    if maplen:
        if maptype == 1:
            m = np.frombuffer(buf[pos : pos + maplen], dtype=np.uint8)
            if len(m) != maplen or maplen % 3:
                raise ValueError("Sun Raster colormap truncated")
            cmap = m.reshape(3, maplen // 3).T  # R plane, G plane, B plane
        elif maptype != 0:
            raise NotImplementedError(
                f"Sun Raster maptype {maptype} not supported"
            )
        pos += maplen
    stride = ((w * depth + 15) // 16) * 2  # rows padded to 16 bits
    expected = stride * h
    raw = buf[pos:]
    if rtype == 2:
        raw = _ras_unrle(raw, expected)
    elif len(raw) < expected:
        raise ValueError("Sun Raster pixel data truncated")
    rows = np.frombuffer(raw[:expected], dtype=np.uint8).reshape(h, stride)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        if cmap is not None and len(cmap) >= 2:
            return cmap[bits].astype(np.uint8)
        px = np.where(bits, 0, 255).astype(np.uint8)  # 1 = ink
        return np.repeat(px[:, :, None], 3, axis=2)
    if depth == 8:
        px = rows[:, :w]
        if cmap is not None:
            return cmap[px].astype(np.uint8)
        return np.repeat(px[:, :, None], 3, axis=2)
    ch = depth // 8
    px = rows[:, : w * ch].reshape(h, w, ch)
    if depth == 24:  # type 1/2 store BGR; type 3 stores RGB
        return px[:, :, ::-1].copy() if rtype != 3 else px.copy()
    # depth 32: x/alpha byte first (xBGR or xRGB)
    x, rest = px[:, :, :1], px[:, :, 1:]
    rgb = rest[:, :, ::-1] if rtype != 3 else rest
    return np.concatenate([rgb, x], axis=2).copy()


def encode_ras(arr, rle: bool = False) -> bytes:
    """(h, w, 3|4) uint8 -> Sun Raster bytes (RT_FORMAT_RGB, or
    RT_BYTE_ENCODED of the RGB layout when rle=True)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("encode_ras expects (h, w, 3|4) uint8")
    h, w, ch = a.shape
    # RT_BYTE_ENCODED is RLE of the RT_STANDARD layout, which is BGR
    # (xBGR at depth 32); RT_FORMAT_RGB stores RGB (xRGB)
    rgb = a[:, :, 2::-1] if rle else a[:, :, :3]
    if ch == 4:  # pad/alpha byte first
        a = np.concatenate([a[:, :, 3:4], rgb], axis=2)
    else:
        a = rgb
    depth = 8 * a.shape[2]
    stride = ((w * depth + 15) // 16) * 2
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * a.shape[2]] = a.reshape(h, -1)
    payload = rows.tobytes()
    rtype = 3
    if rle:
        payload, rtype = _ras_rle(payload), 2
    head = struct.pack(
        ">8i", _RAS_MAGIC, w, h, depth, len(payload), rtype, 0, 0
    )
    return head + payload


# ------------------------------------------------------------------ SGI

def decode_sgi(buf: bytes):
    """SGI image -> (h, w, z) uint8 (z = 1 gray, 3 RGB, 4 RGBA), rows
    flipped to top-down.  Verbatim and RLE storage, 1 byte/channel."""
    if len(buf) < 512:
        raise ValueError("SGI header truncated")
    magic, storage, bpc, dim, w, h, z = struct.unpack(">hBBHHHH", buf[:12])
    if magic != 474:
        raise ValueError("not an SGI image payload")
    if bpc != 1:
        raise NotImplementedError("SGI 2-byte channels not supported")
    if storage not in (0, 1):
        raise NotImplementedError(f"SGI storage {storage} not supported")
    if dim == 1:
        h, z = 1, 1
    elif dim == 2:
        z = 1
    if w <= 0 or h <= 0 or z <= 0:
        raise ValueError("SGI declares empty image")
    out = np.zeros((z, h, w), dtype=np.uint8)
    if storage == 0:
        need = 512 + w * h * z
        if len(buf) < need:
            raise ValueError("SGI verbatim data truncated")
        out = np.frombuffer(buf[512:need], dtype=np.uint8).reshape(z, h, w)
    else:
        ntab = h * z
        tabs = np.frombuffer(buf[512 : 512 + 8 * ntab], dtype=">u4")
        if len(tabs) != 2 * ntab:
            raise ValueError("SGI RLE offset tables truncated")
        starts, lengths = tabs[:ntab], tabs[ntab:]
        for c in range(z):
            for y in range(h):
                o, ln = int(starts[c * h + y]), int(lengths[c * h + y])
                row = _sgi_unrle(buf[o : o + ln], w)
                out[c, y] = row
    # rows are stored bottom-up
    img = np.transpose(out, (1, 2, 0))[::-1]
    return np.ascontiguousarray(img)


def _sgi_unrle(data: bytes, w: int) -> np.ndarray:
    out = np.zeros(w, dtype=np.uint8)
    i, x, n = 0, 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        cnt = b & 0x7F
        if cnt == 0:
            return out
        if x + cnt > w:
            raise ValueError("SGI RLE row overflow")
        if b & 0x80:  # literal copy
            out[x : x + cnt] = np.frombuffer(data[i : i + cnt], np.uint8)
            i += cnt
        else:  # run of one value
            out[x : x + cnt] = data[i]
            i += 1
        x += cnt
    raise ValueError("SGI RLE row missing terminator")


def _sgi_rle_row(row: np.ndarray) -> bytes:
    out = bytearray()
    i, w = 0, len(row)
    while i < w:
        j = i
        while j < w - 1 and j - i < 126 and row[j] == row[j + 1]:
            j += 1
        if j > i:  # run of row[i] over j-i+1 pixels
            out.extend((j - i + 1, int(row[i])))
            i = j + 1
            continue
        j = i
        while (
            j < w
            and j - i < 127
            and not (j + 2 < w and row[j] == row[j + 1] == row[j + 2])
        ):
            j += 1
        out.append(0x80 | (j - i))
        out.extend(row[i:j].tobytes())
        i = j
    out.append(0)
    return bytes(out)


def encode_sgi(arr, rle: bool = True) -> bytes:
    """(h, w, z) uint8 -> SGI bytes (RLE by default, verbatim
    otherwise) — encoder twin for decode_sgi."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, z = a.shape
    planes = np.transpose(a[::-1], (2, 0, 1))  # (z, h, w) bottom-up
    head = struct.pack(
        ">hBBHHHHiii", 474, 1 if rle else 0, 1, 3, w, h, z, 0, 255, 0
    )
    head += b"\x00" * 80 + struct.pack(">i", 0) + b"\x00" * 404
    assert len(head) == 512
    if not rle:
        return head + planes.tobytes()
    rows = [
        _sgi_rle_row(planes[c, y]) for c in range(z) for y in range(h)
    ]
    ntab = h * z
    starts, lengths, off = [], [], 512 + 8 * ntab
    for r in rows:
        starts.append(off)
        lengths.append(len(r))
        off += len(r)
    tab = np.array(starts + lengths, dtype=">u4").tobytes()
    return head + tab + b"".join(rows)


# ------------------------------------------------------------------ PNM

_PNM_MAX_HEADER = 1 << 16


def _pnm_tokens(buf: bytes, n: int):
    """Yield the first n whitespace tokens after the magic, honouring
    '#' comments; returns (tokens, data_offset)."""
    toks, i, L = [], 2, min(len(buf), _PNM_MAX_HEADER)
    while len(toks) < n and i < L:
        c = buf[i : i + 1]
        if c == b"#":
            while i < L and buf[i] not in (0x0A, 0x0D):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < L and not buf[j : j + 1].isspace() and buf[j : j + 1] != b"#":
                j += 1
            toks.append(buf[i:j])
            i = j
    if len(toks) < n:
        raise ValueError("PNM header truncated")
    return toks, i + 1  # single whitespace byte terminates the header


def decode_pnm(buf: bytes):
    """PNM P1-P6 -> (h, w, 3) uint8 RGB (bitmaps: ink -> 0, paper ->
    255; gray replicated; maxval scaled to full range)."""
    if len(buf) < 2 or buf[0:1] != b"P" or buf[1] not in b"123456":
        raise ValueError("not a PNM payload")
    kind = buf[1] - 0x30
    has_max = kind not in (1, 4)
    toks, off = _pnm_tokens(buf, 3 if has_max else 2)
    w, h = int(toks[0]), int(toks[1])
    maxval = int(toks[2]) if has_max else 1
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError("PNM header declares empty image")
    if maxval > 65535:
        raise ValueError("PNM maxval out of spec")
    if kind in (1, 2, 3):  # ASCII variants
        body = buf[off - 1 :]
        body = re.sub(rb"#[^\n\r]*", b"", body)
        vals = np.array(body.split(), dtype=np.int64)
    elif kind == 4:
        stride = (w + 7) // 8
        raw = np.frombuffer(buf[off : off + stride * h], dtype=np.uint8)
        if len(raw) != stride * h:
            raise ValueError("PBM raster truncated")
        vals = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w].ravel()
    else:
        bytes_per = 2 if maxval > 255 else 1
        n = w * h * (3 if kind == 6 else 1)
        raw = buf[off : off + n * bytes_per]
        if len(raw) != n * bytes_per:
            raise ValueError("PNM raster truncated")
        vals = np.frombuffer(raw, dtype=">u2" if bytes_per == 2 else np.uint8)
        vals = vals.astype(np.int64)
    ch = 3 if kind in (3, 6) else 1
    if len(vals) < w * h * ch:
        raise ValueError("PNM raster truncated")
    vals = vals[: w * h * ch].reshape(h, w, ch)
    if kind in (1, 4):  # 1 = ink (black)
        px = np.where(vals, 0, 255).astype(np.uint8)
    else:
        px = ((vals * 255 + maxval // 2) // maxval).clip(0, 255).astype(
            np.uint8
        ) if maxval != 255 else vals.astype(np.uint8)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def encode_pnm(arr, kind: int = 6) -> bytes:
    """(h, w[, 3]) uint8 -> PNM bytes (P5 gray / P6 RGB raw)."""
    a = np.asarray(arr, dtype=np.uint8)
    if kind == 6:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("P6 needs (h, w, 3)")
    elif kind == 5:
        if a.ndim == 3:
            if a.shape[2] != 1:
                raise ValueError("P5 needs (h, w) or (h, w, 1)")
            a = a[:, :, 0]
    else:
        raise NotImplementedError(f"encode_pnm kind P{kind} not supported")
    h, w = a.shape[:2]
    return f"P{kind}\n{w} {h}\n255\n".encode() + a.tobytes()


# ------------------------------------------------------------------ XBM

def decode_xbm(buf: bytes):
    """XBM C-source bitmap -> (h, w, 3) uint8 (set bit = ink = 0).
    Bits are LSB-first within each byte, rows padded to whole bytes."""
    try:
        text = buf.decode("ascii", errors="strict")
    except UnicodeDecodeError as exc:
        raise ValueError("not an XBM payload") from exc
    mw = re.search(r"#define\s+\w*_?width\s+(\d+)", text)
    mh = re.search(r"#define\s+\w*_?height\s+(\d+)", text)
    if not mw or not mh or "_bits[]" not in text and "_bits []" not in text:
        raise ValueError("not an XBM payload")
    w, h = int(mw.group(1)), int(mh.group(1))
    if w <= 0 or h <= 0:
        raise ValueError("XBM declares empty image")
    hexes = re.findall(r"0[xX]([0-9a-fA-F]{1,2})", text.split("{", 1)[1])
    stride = (w + 7) // 8
    if len(hexes) < stride * h:
        raise ValueError("XBM bits truncated")
    raw = np.array([int(x, 16) for x in hexes[: stride * h]], dtype=np.uint8)
    bits = np.unpackbits(raw.reshape(h, stride), axis=1, bitorder="little")
    px = np.where(bits[:, :w], 0, 255).astype(np.uint8)
    return np.repeat(px[:, :, None], 3, axis=2)
