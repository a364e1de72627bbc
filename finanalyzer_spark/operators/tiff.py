"""Baseline TIFF 6.0 codec (Adobe spec, 1992; public) in pure
python/numpy — 8-bit grayscale / RGB / RGBA, strip-organized, with
the three baseline compressions: none (1), LZW (5, MSB-first codes
with EarlyChange and the optional horizontal-differencing predictor),
and PackBits (32773).

Why it's in the tier: TIFF is the scanned-document format — a
document-heavy crawl (patents, archives, paper corpora) carries it the
way web crawls carry JPEG.  Like every codec here it is
exact-or-refuse: unsupported shapes (16-bit samples, tiles, planar
config 2, other compressions) raise NotImplementedError instead of
approximating, and tests pin hand-assembled foreign vectors — the
uncompressed layout byte-by-byte, PackBits runs from the spec's own
worked example, and a hand-written 9-bit LZW code stream — so decode
does not lean on the encoder twin (tests/test_tiff.py).

TIFF-LZW differs from GIF-LZW (operators/gif.py) on every axis that
matters: codes are MSB-first, the table starts at 9 bits with fixed
Clear=256 / EOI=257, and the code width bumps ONE CODE EARLY
(EarlyChange, the de-facto standard all mainstream writers use).
"""

from __future__ import annotations

import struct

_II, _MM = b"II", b"MM"

#: tag ids
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMPRESSION = 256, 257, 258, 259
_T_PHOTOMETRIC, _T_STRIP_OFFSETS, _T_SPP = 262, 273, 277
_T_ROWS_PER_STRIP, _T_STRIP_COUNTS, _T_PLANAR, _T_PREDICTOR = (
    278, 279, 284, 317,
)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(buf: bytes):
    if buf[:2] not in (_II, _MM) or len(buf) < 8:
        raise ValueError("not a TIFF byte stream")
    bo = "<" if buf[:2] == _II else ">"
    (magic,) = struct.unpack(bo + "H", buf[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", buf[e : e + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        raw = buf[e + 8 : e + 12]
        if total > 4:
            (off,) = struct.unpack(bo + "I", raw)
            raw = buf[off : off + total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:  # RATIONAL etc. — not needed here
            continue
        tags[tag] = list(struct.unpack(bo + fmt * cnt, raw[:total]))
    return bo, tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits strip shorter than declared")
    return bytes(out[:expected])


def _packbits(data: bytes) -> bytes:
    """Canonical PackBits: runs of >= 2 as replicates, else literals
    (max 128 either way)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 >= 2
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:
            k = i
            while (
                k + 1 < n
                and k - i < 127
                and not (k + 2 < n and data[k + 1] == data[k + 2])
            ):
                k += 1
            out += bytes([k - i]) + data[i : k + 1]
            i = k + 1
    return bytes(out)


_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW: MSB-first bit packing, 9-bit start, EarlyChange."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                if len(out) < expected:
                    raise ValueError("LZW strip shorter than declared")
                return bytes(out[:expected])
            if prev is None:
                if code >= 256:
                    raise ValueError("LZW stream starts with a table code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond table")
            out += entry
            prev = entry
            if len(out) >= expected:
                # done: like libtiff, decode is driven by the strip's
                # declared byte count, NOT by reading EOI — the code
                # after the final data code sits exactly on the
                # width-bump boundary where encoder and decoder
                # widths legitimately differ by one (the decoder's
                # table catches up to next_code only once there is no
                # following insertion), so the EOI read would be
                # ambiguous; the byte count is not.
                return bytes(out[:expected])
            # EarlyChange: bump one code before the table fills
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    raise ValueError("LZW strip without EOI")


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(_CLEAR, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EarlyChange width bump.  The decoder lags one table entry
        # behind (its entry for the code just written lands only
        # while PROCESSING it), so the write-side threshold is one
        # above the read side's: decoder widens after appending entry
        # 510 (table >= 511), encoder after inserting entry 511
        # (next_code >= 512) — then every steady-state code is read
        # at the width it was written with.
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: emit Clear
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        put(table[w], width)
    put(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(buf: bytes):
    """Decode the first IFD to an (h, w) or (h, w, channels) uint8
    array.  Baseline subset; anything else refuses loudly."""
    import numpy as np

    bo, tags = _read_ifd(buf)
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing mandatory tag {e}") from None
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    comp = tags.get(_T_COMPRESSION, [1])[0]
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF samples")
    if planar != 1:
        raise NotImplementedError("planar (non-chunky) TIFF")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"{spp} samples per pixel")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count tables disagree")

    row_bytes = w * spp
    rows_out = []
    row_at = 0
    for off, cnt in zip(offsets, counts):
        n_rows = min(rows_per_strip, h - row_at)
        if n_rows <= 0:
            break
        raw = buf[off : off + cnt]
        if len(raw) < cnt:
            raise ValueError("truncated TIFF strip")
        expected = n_rows * row_bytes
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("short uncompressed strip")
            strip = raw[:expected]
        elif comp == 32773:
            strip = _unpackbits(raw, expected)
        else:
            strip = _lzw_decode(raw, expected)
        arr = np.frombuffer(strip, dtype=np.uint8).reshape(
            n_rows, w, spp
        )
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint16), axis=1).astype(
                np.uint8
            )
        rows_out.append(arr)
        row_at += n_rows
    if row_at < h:
        raise ValueError("TIFF strips cover fewer rows than declared")
    img = np.concatenate(rows_out, axis=0)
    return img[:, :, 0] if spp == 1 else img


def encode_tiff(img, compression: int = 1,
                rows_per_strip: int = 16,
                predictor: int = 1) -> bytes:
    """Encoder twin: little-endian, chunky, 8-bit, strip-organized."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3, 4):
        raise ValueError("encode_tiff takes gray/RGB/RGBA")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is defined for LZW here")

    strips = []
    for r0 in range(0, h, rows_per_strip):
        block = img[r0 : r0 + rows_per_strip]
        if predictor == 2:
            d = block.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            block = (d & 0xFF).astype(np.uint8)
        raw = block.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits(raw))
        else:
            strips.append(_lzw_encode(raw))

    photometric = 1 if spp == 1 else 2
    entries = [
        (_T_WIDTH, 4, 1, [w]),
        (_T_HEIGHT, 4, 1, [h]),
        (_T_BITS, 3, spp, [8] * spp),
        (_T_COMPRESSION, 3, 1, [compression]),
        (_T_PHOTOMETRIC, 3, 1, [photometric]),
        (_T_SPP, 3, 1, [spp]),
        (_T_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (_T_PLANAR, 3, 1, [1]),
    ]
    if predictor == 2:
        entries.append((_T_PREDICTOR, 3, 1, [2]))

    # layout: header(8) | IFD | overflow values | strip data
    n_entries = len(entries) + 2  # + strip offsets + strip counts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def value_field(typ, cnt, vals):
        nonlocal extra
        fmt = {3: "H", 4: "I"}[typ]
        size = _TYPE_SIZES[typ] * cnt
        packed = b"".join(struct.pack("<" + fmt, v) for v in vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = extra_off + len(extra)
        extra += packed
        return struct.pack("<I", off)

    # strip tables (always LONG, may overflow into extra)
    n_strips = len(strips)
    counts_vals = [len(s) for s in strips]
    # reserve extra for strip tables AFTER other overflow values: do
    # two passes — first non-strip entries, then tables, then data
    fields = []
    for tag, typ, cnt, vals in entries:
        fields.append((tag, typ, cnt, value_field(typ, cnt, vals)))
    if n_strips == 1:
        offsets_field = None  # single value fits inline (patched)
        counts_field = struct.pack("<I", counts_vals[0])
    else:
        offsets_field = None
        counts_off = extra_off + len(extra)
        extra += b"".join(struct.pack("<I", c) for c in counts_vals)
        counts_field = struct.pack("<I", counts_off)
        offsets_table_off = extra_off + len(extra)
        extra += b"\x00" * (4 * n_strips)  # patched below

    data_off = extra_off + len(extra)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    if n_strips == 1:
        offsets_field = struct.pack("<I", strip_offsets[0])
    else:
        for i, so in enumerate(strip_offsets):
            extra[
                offsets_table_off - extra_off + 4 * i :
                offsets_table_off - extra_off + 4 * (i + 1)
            ] = struct.pack("<I", so)
        offsets_field = struct.pack("<I", offsets_table_off)

    fields.append((_T_STRIP_OFFSETS, 4, n_strips, offsets_field))
    fields.append((_T_STRIP_COUNTS, 4, n_strips, counts_field))
    fields.sort(key=lambda f: f[0])

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, field in fields:
        out += struct.pack("<HHI", tag, typ, cnt) + field
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
