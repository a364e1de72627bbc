"""Truevision TGA codec — pure-Python exact-or-refuse tier.

Supports the formats that dominate real TGA corpora: type 2
(uncompressed truecolor), type 3 (uncompressed grayscale), type 10
(RLE truecolor) and type 11 (RLE grayscale), 24/32-bit truecolor and
8-bit gray, both bottom-up (the TGA default) and top-origin rows.
Color-mapped images (types 1/9), 15/16-bit pixels and interleaved
flags refuse with NotImplementedError naming the variant — the same
exact-or-refuse contract as the other codec tiers (a silently-wrong
pixel would poison the parity queries).

Spec: Truevision TGA File Format Specification v2.0 (1991).
Reference engine n/a — the media surface is the extended
LLM-pipeline tier (BASELINE.json north star), not reference parity.
"""

from __future__ import annotations

import struct

__all__ = ["decode_tga", "encode_tga"]


def decode_tga(buf: bytes):
    """TGA bytes -> (h, w, c) uint8 array (c=3 BGR->RGB swapped to
    RGB, c=4 RGBA, c=1 gray). ValueError on malformed payloads,
    NotImplementedError on unsupported variants."""
    import numpy as np

    if len(buf) < 18:
        raise ValueError("TGA header truncated")
    (id_len, cmap_type, img_type, _cm_first, _cm_len, _cm_depth,
     _x0, _y0, w, h, depth, desc) = struct.unpack(
        "<BBBHHBHHHHBB", buf[:18]
    )
    if cmap_type != 0:
        raise NotImplementedError("color-mapped TGA not supported")
    if img_type not in (2, 3, 10, 11):
        raise NotImplementedError(
            f"TGA image type {img_type} not supported"
        )
    if img_type in (2, 10):
        if depth not in (24, 32):
            raise NotImplementedError(
                f"{depth}-bit truecolor TGA not supported (24/32 only)"
            )
    elif depth != 8:
        raise NotImplementedError(
            f"{depth}-bit grayscale TGA not supported (8 only)"
        )
    if desc & 0x10:
        raise NotImplementedError("right-origin TGA not supported")
    if w == 0 or h == 0:
        raise ValueError("TGA empty image")
    bpp = depth // 8
    pos = 18 + id_len
    n_px = w * h
    if img_type in (2, 3):
        need = n_px * bpp
        raw = buf[pos : pos + need]
        if len(raw) != need:
            raise ValueError("TGA pixel data truncated")
        px = np.frombuffer(raw, dtype=np.uint8).reshape(n_px, bpp)
    else:
        out = bytearray()
        need = n_px * bpp
        while len(out) < need:
            if pos >= len(buf):
                raise ValueError("TGA RLE stream truncated")
            head = buf[pos]
            pos += 1
            count = (head & 0x7F) + 1
            if head & 0x80:
                pix = buf[pos : pos + bpp]
                if len(pix) != bpp:
                    raise ValueError("TGA RLE pixel truncated")
                out += pix * count
                pos += bpp
            else:
                chunk = buf[pos : pos + count * bpp]
                if len(chunk) != count * bpp:
                    raise ValueError("TGA raw packet truncated")
                out += chunk
                pos += count * bpp
        if len(out) != need:
            raise ValueError("TGA RLE overrun: packet crosses image end")
        px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(n_px, bpp)
    img = px.reshape(h, w, bpp)
    if not (desc & 0x20):          # bottom-up (the TGA default)
        img = img[::-1]
    if bpp >= 3:                   # stored BGR(A) -> RGB(A)
        img = img[..., [2, 1, 0] + ([3] if bpp == 4 else [])]
    return np.ascontiguousarray(img)


def encode_tga(arr, rle: bool = True) -> bytes:
    """(h, w, 3|4) RGB(A) or (h, w) gray uint8 -> TGA bytes
    (top-origin; type 10/11 RLE by default, 2/3 uncompressed).
    Encoder twin for the decoder — spec-valid output any TGA reader
    accepts."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, c = a.shape
    if c not in (1, 3, 4):
        raise ValueError("TGA encoder needs 1, 3 or 4 channels")
    gray = c == 1
    img_type = (11 if rle else 3) if gray else (10 if rle else 2)
    depth = 8 * c
    desc = 0x20 | (0x08 if c == 4 else 0)   # top-origin; alpha bits
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, depth,
        desc,
    )
    if not gray:                   # RGB(A) -> BGR(A) storage order
        a = a[..., [2, 1, 0] + ([3] if c == 4 else [])]
    flat = a.reshape(h * w, c)
    footer = (
        b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    )  # TGA v2 footer: the format's only signature (the header has no
    #    magic), required for probe_media to identify the payload
    if not rle:
        return head + flat.tobytes() + footer
    out = bytearray(head)
    # RLE per spec: packets must not cross ROW boundaries
    for row in a.reshape(h, w, c):
        i = 0
        while i < w:
            run = 1
            while (i + run < w and run < 128
                   and (row[i + run] == row[i]).all()):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += row[i].tobytes()
                i += run
            else:
                j = i + 1
                while (j < w and j - i < 128
                       and not (j + 1 < w
                                and (row[j] == row[j + 1]).all())):
                    j += 1
                out.append((j - i) - 1)
                out += row[i:j].tobytes()
                i = j
    return bytes(out) + footer
