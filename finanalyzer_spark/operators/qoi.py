"""QOI ("Quite OK Image", qoiformat.org, public domain spec, 2022) —
lossless RGB/RGBA codec in pure python/numpy.

Why this format is in the tier: real web corpora increasingly carry
QOI assets (game/tool pipelines), and the ENTIRE format is one page of
spec with zero normative tables — every op code is arithmetic
(index-hash, byte diffs, runs), so an exact implementation has no
transcription-risk surface, unlike CABAC (SCALE.md).  Decode is
certified three ways in tests/test_qoi.py: encoder-twin round trip,
hand-assembled foreign byte vectors with hand-computed pixels, and
fail-closed truncation/garbage behavior.

Layout (spec §"Data Format"):
  header: magic 'qoif', width u32be, height u32be, channels u8 (3|4),
          colorspace u8 (0|1)
  stream of chunks:
    QOI_OP_RGB   11111110 r g b
    QOI_OP_RGBA  11111111 r g b a
    QOI_OP_INDEX 00xxxxxx                (index into 64-slot cache)
    QOI_OP_DIFF  01drdgdb               (2-bit channel diffs, bias 2)
    QOI_OP_LUMA  10dddddd dgdrdgdb      (6-bit dg bias 32; 4-bit
                                          dr-dg / db-dg bias 8)
    QOI_OP_RUN   11xxxxxx                (run 1..62, bias -1)
  end marker: seven 0x00 then 0x01
Cache slot: (3r + 5g + 7b + 11a) % 64.  All wrap-around byte math.
"""

from __future__ import annotations

import struct

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img, colorspace: int = 0) -> bytes:
    """Encode an (h, w, 3|4) uint8 array.  Deterministic: always emits
    the shortest applicable op in the spec's canonical preference
    order (RUN > INDEX > DIFF > LUMA > RGB/RGBA)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("QOI encodes (h, w, 3|4) uint8 arrays")
    h, w, ch = img.shape
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", w, h, ch, colorspace)
    cache = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, ch)
    for px in flat:
        if ch == 4:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), int(px[3])
        else:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash(r, g, b, a)
        if cache[idx] == (r, g, b, a):
            out.append(idx)
        else:
            cache[idx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr) & 0xFF
                dg = (g - pg) & 0xFF
                db = (b - pb) & 0xFF
                # interpret as signed wrap-around deltas
                sdr = dr - 256 if dr > 127 else dr
                sdg = dg - 256 if dg > 127 else dg
                sdb = db - 256 if db > 127 else db
                if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                    out.append(
                        0x40
                        | ((sdr + 2) << 4)
                        | ((sdg + 2) << 2)
                        | (sdb + 2)
                    )
                elif (
                    -32 <= sdg <= 31
                    and -8 <= sdr - sdg <= 7
                    and -8 <= sdb - sdg <= 7
                ):
                    out.append(0x80 | (sdg + 32))
                    out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
                else:
                    out.append(0xFE)
                    out += bytes((r, g, b))
            elif ch == 4:
                out.append(0xFF)
                out += bytes((r, g, b, a))
            else:  # pragma: no cover - a==pa always holds for RGB
                out.append(0xFE)
                out += bytes((r, g, b))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(buf: bytes):
    """Decode to an (h, w, channels) uint8 array.  ValueError on
    non-QOI payloads, truncation, or pixel-count mismatch — decode is
    exact-or-refuse like every codec in this tier."""
    import numpy as np

    if len(buf) < 14 or buf[:4] != _MAGIC:
        raise ValueError("not a QOI byte stream")
    w, h, ch, colorspace = struct.unpack(">IIBB", buf[4:14])
    if ch not in (3, 4) or colorspace not in (0, 1):
        raise ValueError("invalid QOI header")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    cache = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(buf) - 8
    while i < n:
        if pos >= end:
            raise ValueError("truncated QOI chunk stream")
        op = buf[pos]
        pos += 1
        if op == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif op == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = (
                buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            )
            pos += 4
        elif op >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = cache[op & 0x3F]
        elif op >> 6 == 1:  # QOI_OP_DIFF
            r = (r + ((op >> 4) & 3) - 2) & 0xFF
            g = (g + ((op >> 2) & 3) - 2) & 0xFF
            b = (b + (op & 3) - 2) & 0xFF
        elif op >> 6 == 2:  # QOI_OP_LUMA
            if pos + 1 > end:
                raise ValueError("truncated QOI_OP_LUMA")
            dg = (op & 0x3F) - 32
            nxt = buf[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0x0F) - 8) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg + (nxt & 0x0F) - 8) & 0xFF
        else:  # QOI_OP_RUN
            run = (op & 0x3F) + 1
            if i + run > n:
                raise ValueError("QOI run overruns the pixel count")
            out[i : i + run] = (r, g, b, a)
            i += run
            continue
        cache[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if buf[pos : pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    return out[:, :ch].reshape(h, w, ch)
