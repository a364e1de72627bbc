"""Pure-python GIF codec (GIF87a/89a) — no codec library.

Decoder: LZW decompression with full dictionary growth/reset, global
and local color tables, Adam-style 4-pass interlacing, frame
compositing with disposal methods 0/1 (draw over) and 2 (restore to
background) and 89a transparency. Yields every frame as (h, w, 3)
uint8 RGB — animated GIFs demux like a tiny video. Encoder twin:
exact-palette quantization (≤256 distinct colors) + a real LZW
compressor (variable code width, dictionary growth, clear codes), the
fixture builder for the decoder tests.

Spec: GIF89a specification (CompuServe, public); LZW per the spec's
variable-code-size variant. Reference context: the reference repo has
no media surface — this extends the training-data ingest tier
(operators/multimodal.decode_image_features routes .gif payloads
here) alongside PNG/JPEG/MJPEG-AVI.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: interlace pass layout: (start row, step) per the spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LZWReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return -1  # truncated stream: treat as end
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF variable-width LZW → index stream of exactly n_pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LZWReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == -1 or code == end:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return bytes(out[:n_pixels])


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(buf[pos : pos + n])
        pos += n


def decode_gif(buf: bytes):
    """Yield (frame_no, (h, w, 3) uint8 RGB) composited frames."""
    if buf[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF byte stream")
    w, h, flags, bg_idx, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(
            -1, 3
        )
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    background = canvas.copy()
    transparent: int | None = None
    disposal = 0
    frame_no = 0
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = buf[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blk, pos = _sub_blocks(buf, pos)
                if len(blk) >= 4:
                    gflags = blk[0]
                    disposal = (gflags >> 2) & 0x07
                    transparent = blk[3] if gflags & 0x01 else None
            else:  # comment / app / plain-text: skip sub-blocks
                _, pos = _sub_blocks(buf, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", buf[pos + 1 : pos + 10])
        pos += 10
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(
                buf[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame with no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _sub_blocks(buf, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code, data, iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows into place
            out = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE:
                n_rows = len(range(start, ih, step))
                out[start::step] = idx[src : src + n_rows]
                src += n_rows
            idx = out
        before = canvas.copy()
        region = canvas[iy : iy + ih, ix : ix + iw]
        colors = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, colors, region)
        else:
            region[:] = colors
        yield frame_no, canvas.copy()
        frame_no += 1
        if disposal == 2:  # restore to background
            canvas[iy : iy + ih, ix : ix + iw] = background[
                iy : iy + ih, ix : ix + iw
            ]
        elif disposal == 3:  # restore to previous
            canvas = before
        # disposal 0/1: leave the frame in place
        # a graphic-control extension applies to ONE image only
        transparent, disposal = None, 0


class _LZWWriter:
    """LSB-first bit writer emitting 255-byte GIF sub-blocks."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.bytes = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real GIF LZW compression with dictionary growth + clear codes."""
    clear = 1 << min_code_size
    end = clear + 1
    writer = _LZWWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, clear + 2

    table, next_code = reset()
    width = min_code_size + 1

    def emit(code: int) -> None:
        # the decoder reads the NEXT code with a width that covers its
        # own next_code (= ours - 1, one entry behind) INCLUDING the
        # KwKwK code equal to it — so grow exactly when our next_code
        # no longer fits the current width, checked before every write
        nonlocal width
        while next_code > (1 << width) and width < 12:
            width += 1
        writer.write(code, width)

    emit(clear)
    prev = b""
    for byte in indices:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        else:
            emit(clear)
            table, next_code = reset()
            width = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(end)
    return writer.finish()


def encode_gif(frames, transparent_bg: bool = False) -> bytes:
    """(h, w, 3) uint8 frames → animated GIF89a with an exact global
    palette (≤256 distinct colors across all frames — raise
    otherwise; the fixture builder does not quantize)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    n_slots = max(2, 1 << int(np.ceil(np.log2(max(2, len(colors))))))
    palette = np.zeros((n_slots, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    gct_bits = int(np.log2(n_slots)) - 1
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
    out += palette.tobytes()
    min_code = max(2, gct_bits + 1)
    for f in frames:
        out += bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # GCE: disposal 1
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        idx = bytes(
            lut[tuple(px)] for px in f.reshape(-1, 3)
        )
        out += bytes([min_code]) + _lzw_encode(min_code, idx)
    out += b"\x3b"
    return bytes(out)
