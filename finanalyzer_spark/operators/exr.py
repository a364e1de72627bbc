"""OpenEXR scanline images: the HDR interchange format (ILM, public
spec at openexr.com) — header attribute parsing, the scanline offset
table, NO/ZIPS/ZIP compression with the EXR reconstruction filter
(delta + two-lane byte deinterleave), and HALF/FLOAT/UINT channel
types via numpy float16/float32/uint32.

Extends the media tier's image matrix with linear-light float pixels
(PNG/TIFF/QOI/... are all integer formats); certified against the
genuinely foreign stdlib `imghdrdata/python.exr` (written by an
external tool; uncompressed ABGR half) plus bit-exact encoder-twin
round trips for both the uncompressed and ZIP paths
(tests/test_exr.py).  Exact-or-refuse: PIZ/PXR24/B44/DWA compression,
tiled images and deep data raise NotImplementedError.

Returns (h, w, c) float32 arrays with channels in the file's
ALPHABETICAL storage order plus the channel-name list, so callers can
reorder (EXR stores channels sorted by name, e.g. A,B,G,R)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_PIXEL_DTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}
_PIXEL_SIZE = {0: 4, 1: 2, 2: 4}


def _parse_header(buf: bytes):
    if buf[:4] != _MAGIC:
        raise ValueError("not an OpenEXR payload")
    version = struct.unpack("<I", buf[4:8])[0]
    if version & 0x200:
        raise NotImplementedError("EXR tiled images not supported")
    if version & 0x800:
        raise NotImplementedError("EXR deep data not supported")
    if version & 0x1000:
        raise NotImplementedError("EXR multi-part files not supported")
    attrs, pos = {}, 8
    while True:
        e = buf.index(b"\x00", pos)
        name = buf[pos:e].decode("latin1")
        pos = e + 1
        if not name:
            break
        e = buf.index(b"\x00", pos)
        typ = buf[pos:e].decode("latin1")
        pos = e + 1
        (sz,) = struct.unpack("<I", buf[pos : pos + 4])
        pos += 4
        attrs[name] = (typ, buf[pos : pos + sz])
        pos += sz
    return attrs, pos


def _parse_channels(raw: bytes):
    """chlist -> [(name, pixel_type)] in storage (alphabetical) order."""
    out, pos = [], 0
    while pos < len(raw) and raw[pos] != 0:
        e = raw.index(b"\x00", pos)
        name = raw[pos:e].decode("latin1")
        pos = e + 1
        ptype, _lin, xs, ys = struct.unpack(
            "<IBxxxII", raw[pos : pos + 16]
        )
        pos += 16
        if ptype not in _PIXEL_DTYPE:
            raise ValueError(f"EXR channel type {ptype} invalid")
        if xs != 1 or ys != 1:
            raise NotImplementedError("EXR subsampled channels unsupported")
        out.append((name, ptype))
    return out


def _reconstruct(data: bytes) -> bytes:
    """EXR post-inflate reconstruction: undo delta coding, then
    re-interleave the two half-length lanes (spec 'ZIP compression')."""
    d = bytearray(data)
    for i in range(1, len(d)):
        d[i] = (d[i] + d[i - 1] - 128) & 0xFF
    half = (len(d) + 1) // 2
    out = bytearray(len(d))
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return bytes(out)


def _filter(data: bytes) -> bytes:
    """Encoder twin of _reconstruct (deinterleave, then delta)."""
    half = (len(data) + 1) // 2
    t = bytearray(half + len(data) - half)
    t[:half] = data[0::2]
    t[half:] = data[1::2]
    out = bytearray(len(t))
    prev = 0
    for i, v in enumerate(t):
        if i == 0:
            out[0] = v
        else:
            out[i] = (v - prev + 128) & 0xFF
        prev = v
    return bytes(out)


def decode_exr(buf: bytes):
    """OpenEXR scanline -> ((h, w, c) float32, [channel names]).

    UINT channels are returned as their float value; HALF/FLOAT
    upcast losslessly to float32."""
    attrs, pos = _parse_header(buf)
    if "channels" not in attrs or "dataWindow" not in attrs:
        raise ValueError("EXR missing channels/dataWindow")
    if "compression" not in attrs:
        raise ValueError("EXR missing compression")
    comp = attrs["compression"][1][0]
    if comp not in (0, 2, 3):  # NONE, ZIPS, ZIP
        raise NotImplementedError(
            f"EXR compression {comp} not supported (NONE/ZIPS/ZIP only)"
        )
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    if w <= 0 or h <= 0:
        raise ValueError("EXR empty data window")
    chans = _parse_channels(attrs["channels"][1])
    rows_per = 1 if comp in (0, 2) else 16
    n_blocks = (h + rows_per - 1) // rows_per
    offsets = struct.unpack(
        f"<{n_blocks}q", buf[pos : pos + 8 * n_blocks]
    )
    row_bytes = sum(_PIXEL_SIZE[t] * w for _, t in chans)
    out = np.zeros((h, w, len(chans)), dtype=np.float32)
    for off in offsets:
        y, sz = struct.unpack("<iI", buf[off : off + 8])
        data = buf[off + 8 : off + 8 + sz]
        if len(data) != sz:
            raise ValueError("EXR scanline block truncated")
        rows = min(rows_per, y1 - y + 1)
        raw_len = row_bytes * rows
        if comp == 0 or len(data) == raw_len:
            # uncompressed, or a block the writer stored raw because
            # zlib didn't shrink it (spec behavior)
            raw = data
        else:
            raw = _reconstruct(zlib.decompress(data))
        if len(raw) != raw_len:
            raise ValueError("EXR scanline size mismatch")
        for r in range(rows):
            base = r * row_bytes
            cpos = 0
            for ci, (_, t) in enumerate(chans):
                n = _PIXEL_SIZE[t] * w
                lane = np.frombuffer(
                    raw[base + cpos : base + cpos + n],
                    dtype=_PIXEL_DTYPE[t],
                )
                out[y - y0 + r, :, ci] = lane.astype(np.float32)
                cpos += n
    return out, [n for n, _ in chans]


def encode_exr(arr, channels=None, compression: str = "zip") -> bytes:
    """(h, w, c) float -> OpenEXR bytes (HALF channels; encoder twin).

    channels: names for each plane (default R,G,B[,A] order by count);
    stored sorted alphabetically per the spec.  compression: 'none' |
    'zips' (1-row zlib) | 'zip' (16-row zlib)."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if channels is None:
        channels = (["Y"], ["U", "V"], ["R", "G", "B"], ["A", "B", "G", "R"])[
            c - 1
        ] if c <= 4 else [f"C{i}" for i in range(c)]
    if len(channels) != c:
        raise ValueError("channel-name count mismatch")
    order = sorted(range(c), key=lambda i: channels[i])
    comp_id = {"none": 0, "zips": 2, "zip": 3}[compression]
    rows_per = {0: 1, 2: 1, 3: 16}[comp_id]

    def attr(name, typ, val):
        return (
            name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<I", len(val)) + val
        )

    chlist = b""
    for i in order:
        chlist += (
            channels[i].encode() + b"\x00"
            + struct.pack("<IBxxxII", 1, 0, 1, 1)
        )
    chlist += b"\x00"
    dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    head = _MAGIC + struct.pack("<I", 2)
    head += attr("channels", "chlist", chlist)
    head += attr("compression", "compression", bytes([comp_id]))
    head += attr("dataWindow", "box2i", dw)
    head += attr("displayWindow", "box2i", dw)
    head += attr("lineOrder", "lineOrder", b"\x00")
    head += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    head += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    head += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    head += b"\x00"

    half = a.astype(np.float16)
    blocks = []
    for y in range(0, h, rows_per):
        rows = min(rows_per, h - y)
        raw = b"".join(
            half[y + r, :, i].tobytes()
            for r in range(rows)
            for i in order
        )
        if comp_id == 0:
            payload = raw
        else:
            z = zlib.compress(_filter(raw))
            payload = z if len(z) < len(raw) else raw
        blocks.append((y, payload))
    n_blocks = len(blocks)
    table_pos = len(head)
    data_pos = table_pos + 8 * n_blocks
    offsets, body, off = [], b"", data_pos
    for y, payload in blocks:
        offsets.append(off)
        chunk = struct.pack("<iI", y, len(payload)) + payload
        body += chunk
        off += len(chunk)
    return head + struct.pack(f"<{n_blocks}q", *offsets) + body
