"""ZSoft PCX codec — pure-Python exact-or-refuse tier.

Supports the variants that survive in real archives: version 5
truecolor (8 bits/pixel, 3 planes, per-row RLE) and version 5
palette-indexed 8-bit single-plane with the trailing VGA palette
(0x0C marker + 768 bytes), which decodes to RGB through the palette.
1/2/4-bit planar EGA images and uncompressed (encoding=0) payloads
refuse with NotImplementedError naming the variant — the
exact-or-refuse contract of the codec tiers.

Spec: ZSoft PCX File Format Technical Reference Manual (1991).
Reference engine n/a — extended LLM-pipeline media surface.
"""

from __future__ import annotations

import struct

__all__ = ["decode_pcx", "encode_pcx"]


def _rle_decode_row(buf: bytes, pos: int, n: int):
    """One RLE-encoded scanline plane of n bytes -> (bytes, new pos)."""
    out = bytearray()
    while len(out) < n:
        if pos >= len(buf):
            raise ValueError("PCX RLE stream truncated")
        b = buf[pos]
        pos += 1
        if b >= 0xC0:
            count = b & 0x3F
            if pos >= len(buf):
                raise ValueError("PCX RLE run value truncated")
            out += bytes([buf[pos]]) * count
            pos += 1
        else:
            out.append(b)
    if len(out) != n:
        raise ValueError("PCX RLE run crosses scanline boundary")
    return bytes(out), pos


def decode_pcx(buf: bytes):
    """PCX bytes -> (h, w, 3) uint8 RGB. ValueError on malformed
    payloads, NotImplementedError on unsupported variants."""
    import numpy as np

    if len(buf) < 128:
        raise ValueError("PCX header truncated")
    (magic, version, encoding, bpp, x0, y0, x1, y1) = struct.unpack(
        "<BBBBHHHH", buf[:12]
    )
    if magic != 0x0A:
        raise ValueError("not a PCX payload")
    if encoding != 1:
        raise NotImplementedError("uncompressed PCX not supported")
    n_planes = buf[65]
    (bytes_per_line,) = struct.unpack("<H", buf[66:68])
    if bpp != 8 or n_planes not in (1, 3):
        raise NotImplementedError(
            f"PCX {bpp}-bit x {n_planes}-plane not supported"
            " (8-bit 1- or 3-plane only)"
        )
    w, h = x1 - x0 + 1, y1 - y0 + 1
    if w <= 0 or h <= 0:
        raise ValueError("PCX empty image")
    if bytes_per_line < w:
        raise ValueError("PCX bytes_per_line smaller than width")
    pos = 128
    rows = []
    for _y in range(h):
        planes = []
        for _p in range(n_planes):
            row, pos = _rle_decode_row(buf, pos, bytes_per_line)
            planes.append(row[:w])          # drop pad bytes
        rows.append(planes)
    arr = np.array(
        [[list(p) for p in r] for r in rows], dtype=np.uint8
    )                                       # (h, planes, w)
    if n_planes == 3:
        return np.ascontiguousarray(arr.transpose(0, 2, 1))
    # 8-bit indexed: the VGA palette trails the image data
    if pos < len(buf) and buf[pos] == 0x0C and len(buf) >= pos + 769:
        pal = np.frombuffer(
            buf[pos + 1 : pos + 769], dtype=np.uint8
        ).reshape(256, 3)
    else:
        raise NotImplementedError(
            "8-bit PCX without a VGA palette not supported"
        )
    idx = arr[:, 0, :]                      # (h, w)
    return np.ascontiguousarray(pal[idx])


def _rle_encode_row(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 63 and row[i + run] == row[i]:
            run += 1
        if run > 1 or row[i] >= 0xC0:
            out.append(0xC0 | run)
            out.append(row[i])
        else:
            out.append(row[i])
        i += run
    return bytes(out)


def encode_pcx(arr) -> bytes:
    """(h, w, 3) RGB uint8 -> version-5 truecolor PCX (8-bit, 3
    planes, per-row RLE, even bytes_per_line per the spec's
    recommendation). Encoder twin for the decoder."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("PCX encoder needs an (h, w, 3) RGB array")
    h, w, _ = a.shape
    bpl = w + (w & 1)                       # even, >= w
    head = bytearray(128)
    struct.pack_into(
        "<BBBBHHHH", head, 0, 0x0A, 5, 1, 8, 0, 0, w - 1, h - 1
    )
    struct.pack_into("<HH", head, 12, 72, 72)   # dpi
    head[65] = 3
    struct.pack_into("<H", head, 66, bpl)
    head[68] = 1                            # palette_info: color
    out = bytearray(head)
    pad = bytes(bpl - w)
    for y in range(h):
        for p in range(3):
            out += _rle_encode_row(a[y, :, p].tobytes() + pad)
    return bytes(out)
