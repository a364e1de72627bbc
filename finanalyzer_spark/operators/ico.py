"""Windows ICO container codec — pure-Python exact-or-refuse tier.

Supports the two payload kinds real .ico files carry: the classic
BMP DIB entry (BITMAPINFOHEADER with DOUBLED biHeight covering the
XOR bitmap plus the 1-bpp AND transparency mask, bottom-up rows,
32-bit BGRA BI_RGB) and the PNG-compressed entry Vista introduced
(delegated to operators/png.decode_png, so the full PNG matrix —
depths, Adam7 — rides along). Paletted / 24-bit DIB entries, cursor
files (type 2) and out-of-range entry indices refuse with an error
naming the variant — the exact-or-refuse contract of the codec tiers.

Spec: Microsoft "Icons" documentation (ICONDIR / ICONDIRENTRY /
BITMAPINFOHEADER); PNG entries per the Vista icon format notes.
Reference engine n/a — extended LLM-pipeline media surface.
"""

from __future__ import annotations

import struct

__all__ = ["decode_ico", "encode_ico", "probe_ico"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _entries(buf: bytes):
    """Parse ICONDIR + ICONDIRENTRY table -> list of entry dicts."""
    if len(buf) < 6:
        raise ValueError("ICO header truncated")
    reserved, typ, count = struct.unpack_from("<HHH", buf, 0)
    if reserved != 0 or typ not in (1, 2):
        raise ValueError("not an ICO payload")
    if typ == 2:
        raise NotImplementedError(
            "CUR cursor files (ICONDIR type 2) not supported"
        )
    if count == 0:
        raise ValueError("ICO directory is empty")
    if len(buf) < 6 + 16 * count:
        raise ValueError("ICO directory truncated")
    out = []
    for i in range(count):
        w, h, ncol, res, planes, bits, size, off = struct.unpack_from(
            "<BBBBHHII", buf, 6 + 16 * i
        )
        out.append(
            {
                "width": w or 256,
                "height": h or 256,
                "palette_colors": ncol,
                "bit_count": bits,
                "size": size,
                "offset": off,
            }
        )
    return out


def probe_ico(buf: bytes) -> dict:
    """Metadata-only probe: entry count + per-entry dimensions/kind
    (no pixel decode) — the probe_media-tier view of a container."""
    entries = _entries(buf)
    kinds = []
    for e in entries:
        if e["offset"] + 8 <= len(buf) and buf[
            e["offset"]:e["offset"] + 8
        ] == _PNG_MAGIC:
            kinds.append("png")
        else:
            kinds.append("dib")
    return {
        "container": "ico",
        "n_images": len(entries),
        "entries": [
            {"width": e["width"], "height": e["height"], "kind": k}
            for e, k in zip(entries, kinds)
        ],
    }


def decode_ico(buf: bytes, index: int = 0):
    """ICO bytes -> (h, w, 4) uint8 RGBA of entry `index`.

    DIB entries apply the 1-bpp AND mask as alpha=0 on top of the
    stored alpha byte (the classic-icon transparency rule); PNG
    entries delegate to decode_png. ValueError on malformed payloads,
    NotImplementedError on unsupported variants."""
    import numpy as np

    entries = _entries(buf)
    if not 0 <= index < len(entries):
        raise ValueError(
            f"ICO entry index {index} out of range ({len(entries)} entries)"
        )
    e = entries[index]
    lo, hi = e["offset"], e["offset"] + e["size"]
    if hi > len(buf):
        raise ValueError("ICO entry data truncated")
    data = buf[lo:hi]

    if data[:8] == _PNG_MAGIC:
        from .png import decode_png

        img = decode_png(data)
        if img.ndim == 2:  # grayscale -> RGBA
            img = np.stack([img] * 3 + [np.full_like(img, 255)], axis=2)
        elif img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, img.dtype)],
                axis=2,
            )
        return img

    if len(data) < 40:
        raise ValueError("ICO DIB header truncated")
    header_size = struct.unpack_from("<I", data, 0)[0]
    if header_size != 40:
        raise NotImplementedError(
            f"ICO DIB header size {header_size} unsupported"
        )
    w, h2 = struct.unpack_from("<ii", data, 4)
    bpp = struct.unpack_from("<H", data, 14)[0]
    compression = struct.unpack_from("<I", data, 16)[0]
    if compression != 0:
        raise NotImplementedError(
            f"ICO DIB compression {compression} not supported"
        )
    if bpp != 32:
        raise NotImplementedError(
            f"only 32-bit BGRA ICO DIB entries supported (bpp={bpp})"
        )
    if w <= 0 or h2 <= 0 or h2 % 2:
        raise ValueError(f"bad ICO DIB dimensions {w}x{h2}")
    h = h2 // 2  # stored height covers XOR bitmap + AND mask
    xor_stride = w * 4  # 32 bpp rows are already 4-byte aligned
    and_stride = (w + 31) // 32 * 4  # 1 bpp rows pad to 32 bits
    need = 40 + xor_stride * h + and_stride * h
    if len(data) < need:
        raise ValueError(f"truncated ICO DIB ({len(data)} < {need} bytes)")
    xor = (
        np.frombuffer(data, np.uint8, count=xor_stride * h, offset=40)
        .reshape(h, w, 4)[::-1]  # bottom-up
    )
    raw_and = np.frombuffer(
        data, np.uint8, count=and_stride * h, offset=40 + xor_stride * h
    ).reshape(h, and_stride)[::-1]
    bits = np.unpackbits(raw_and, axis=1)[:, :w]  # 1 = transparent
    rgba = np.stack(
        [xor[:, :, 2], xor[:, :, 1], xor[:, :, 0], xor[:, :, 3]], axis=2
    ).copy()
    rgba[:, :, 3] = np.where(bits == 1, 0, rgba[:, :, 3])
    return rgba


def encode_ico(img) -> bytes:
    """(h, w, 3|4) uint8 -> single-entry classic-DIB ICO bytes (32-bit
    BGRA XOR bitmap, all-opaque AND mask, bottom-up rows)."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_ico expects (h, w, 3|4) uint8")
    h, w = arr.shape[:2]
    if not (1 <= w <= 256 and 1 <= h <= 256):
        raise ValueError(f"ICO dimensions {w}x{h} out of 1..256")
    if arr.shape[2] == 3:
        arr = np.concatenate(
            [arr, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    bgra = arr[:, :, [2, 1, 0, 3]][::-1]  # bottom-up BGRA
    and_stride = (w + 31) // 32 * 4
    and_mask = bytes(and_stride * h)  # fully opaque
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, 2 * h, 1, 32, 0,
        w * 4 * h + and_stride * h,
        0, 0, 0, 0,
    ) + bgra.tobytes() + and_mask
    entry = struct.pack(
        "<BBBBHHII",
        w % 256, h % 256,  # 256 encodes as 0
        0, 0, 1, 32, len(dib), 6 + 16,
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + dib
