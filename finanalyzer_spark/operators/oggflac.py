"""Ogg-encapsulated FLAC (the Ogg-FLAC mapping): demux to the native
stream the certified FLAC tier decodes, plus the encoder-twin mux.

The mapping (xiph.org "FLAC-to-Ogg mapping", version 1.0): the BOS
page carries one packet `0x7F 'FLAC' major minor nheader(2 BE)
'fLaC' STREAMINFO-block`; each following header packet is one native
metadata block; each audio packet carries native FLAC frame bytes.
Demux therefore reconstructs the native stream as
`'fLaC' + STREAMINFO + header packets + audio bytes` — packet
boundaries inside the audio section don't matter because native FLAC
frames are self-delimiting to the decoder.

Page-level structure per RFC 3533: capture 'OggS', version 0, header
type flags (0x01 continuation / 0x02 BOS / 0x04 EOS), 64-bit granule
position, serial, sequence, CRC-32 (poly 0x04c11db7, init 0, no
reflection — computed with the CRC field zeroed), segment lacing
(255 = packet continues). Exact-or-refuse: truncated pages, a
non-FLAC BOS packet, or a broken page CRC raise.

Reference engine n/a — extended LLM-pipeline media surface.
"""

from __future__ import annotations

import struct

__all__ = ["demux_ogg_flac", "mux_ogg_flac", "ogg_crc"]

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _CRC_TABLE = tab
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: poly 0x04c11db7, init 0, unreflected."""
    tab = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


def _pages(buf: bytes):
    """Yield (flags, granule, body_segments) per page; verify CRC."""
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 4] != b"OggS":
            raise ValueError("Ogg page capture lost")
        if pos + 27 > len(buf):
            raise ValueError("Ogg page header truncated")
        version, flags = buf[pos + 4], buf[pos + 5]
        if version != 0:
            raise NotImplementedError(f"Ogg version {version} unsupported")
        granule = struct.unpack_from("<q", buf, pos + 6)[0]
        crc = struct.unpack_from("<I", buf, pos + 22)[0]
        nsegs = buf[pos + 26]
        lacing = buf[pos + 27:pos + 27 + nsegs]
        if len(lacing) != nsegs:
            raise ValueError("Ogg lacing table truncated")
        body_len = sum(lacing)
        start = pos + 27 + nsegs
        if start + body_len > len(buf):
            raise ValueError("Ogg page body truncated")
        page = bytearray(buf[pos:start + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        body = buf[start:start + body_len]
        segs, off = [], 0
        for lv in lacing:
            segs.append((body[off:off + lv], lv))
            off += lv
        yield flags, granule, segs
        pos = start + body_len


def _packets(buf: bytes):
    """Reassemble packets across segments/pages -> list of bytes."""
    packets, cur = [], bytearray()
    for _flags, _granule, segs in _pages(buf):
        for data, lv in segs:
            cur += data
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
    if cur:
        # packet left open at EOS — truncated stream
        raise ValueError("Ogg stream ends mid-packet")
    return packets


def demux_ogg_flac(buf: bytes) -> bytes:
    """Ogg-FLAC bytes -> native FLAC stream ('fLaC' + metadata +
    frames) for operators/flac.decode_flac."""
    if buf[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    packets = _packets(buf)
    if not packets:
        raise ValueError("empty Ogg stream")
    bos = packets[0]
    if bos[:5] != b"\x7fFLAC":
        raise NotImplementedError(
            "Ogg BOS packet is not FLAC (Vorbis/Opus/Theora decode is"
            " out of the pure tier's scope; probe_media names them)"
        )
    major, _minor = bos[5], bos[6]
    if major != 1:
        raise NotImplementedError(
            f"Ogg-FLAC mapping major version {major} unsupported"
        )
    nheader = struct.unpack_from(">H", bos, 7)[0]
    if bos[9:13] != b"fLaC":
        raise ValueError("Ogg-FLAC BOS packet missing native signature")
    streaminfo = bos[13:]
    if len(streaminfo) < 38:
        raise ValueError("Ogg-FLAC BOS STREAMINFO truncated")
    # header packets follow (nheader of them when declared; otherwise
    # every packet whose first byte is not a frame-sync byte)
    out = bytearray(b"fLaC")
    out += streaminfo
    rest = packets[1:]
    n_hdr = nheader
    if n_hdr == 0:
        n_hdr = 0
        for p in rest:
            if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xFC) == 0xF8:
                break
            n_hdr += 1
    headers, audio = rest[:n_hdr], rest[n_hdr:]
    if headers and n_hdr:
        # the mapping requires the LAST header block to carry the
        # last-metadata flag; STREAMINFO must then not carry it
        out[4] &= 0x7F
        for i, h in enumerate(headers):
            hb = bytearray(h)
            if i == len(headers) - 1:
                hb[0] |= 0x80
            else:
                hb[0] &= 0x7F
            out += hb
    else:
        out[4] |= 0x80  # STREAMINFO is the only metadata block
    for p in audio:
        out += p
    return bytes(out)


def _page(flags: int, granule: int, serial: int, seq: int,
          packet_chunks: list[bytes], open_tail: bool = False) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for i, chunk in enumerate(packet_chunks):
        # RFC 3533 lacing: len//255 full segments + one final segment
        # of len%255 (a multiple-of-255 packet ends with a 0 segment)
        q, r = divmod(len(chunk), 255)
        lacing += b"\xff" * q
        if open_tail and i == len(packet_chunks) - 1:
            # last packet continues on the next page: emit only full
            # 255-segments (caller guarantees len % 255 == 0), so no
            # packet ends on this page and granule -1 is conformant
            if r:
                raise ValueError("open-tail chunk must be 255-aligned")
        else:
            lacing.append(r)
        body += chunk
    hdr = bytearray(b"OggS")
    hdr += bytes([0, flags])
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def mux_ogg_flac(native: bytes, serial: int = 0x464C4143) -> bytes:
    """Native FLAC stream -> Ogg-FLAC bytes (mapping v1.0): BOS page
    with the 0x7F'FLAC' id packet, one page per remaining metadata
    block, then the frame section split across ~4 KiB audio pages
    (native frames are self-delimiting, so page boundaries are free).
    The final page carries total_samples as its granule and EOS."""
    if native[:4] != b"fLaC":
        raise ValueError("not a native FLAC stream")
    pos = 4
    blocks = []
    while True:
        if pos + 4 > len(native):
            raise ValueError("FLAC metadata truncated")
        last = native[pos] & 0x80
        size = int.from_bytes(native[pos + 1:pos + 4], "big")
        blocks.append(native[pos:pos + 4 + size])
        pos += 4 + size
        if last:
            break
    streaminfo, others = blocks[0], blocks[1:]
    total_samples = (
        int.from_bytes(streaminfo[4 + 13:4 + 18], "big") & 0xFFFFFFFFF
    )
    frames = native[pos:]
    si = bytearray(streaminfo)
    si[0] &= 0x7F  # last-metadata flag is re-derived on demux
    bos_packet = (
        b"\x7fFLAC\x01\x00" + struct.pack(">H", len(others))
        + b"fLaC" + bytes(si)
    )
    pages = [_page(0x02, 0, serial, 0, [bos_packet])]
    seq = 1
    for i, blk in enumerate(others):
        hb = bytearray(blk)
        if i == len(others) - 1:
            hb[0] |= 0x80
        pages.append(_page(0, 0, serial, seq, [bytes(hb)]))
        seq += 1
    # The frame section rides as ONE logical packet continued across
    # ~4 KiB pages (FLAC frames are self-delimiting, so any RFC 3533
    # packet reassembler recovers the byte stream intact).  Chunk size
    # is 255-aligned so intermediate pages carry only full lacing
    # segments: no packet ends on them, which is exactly the RFC 3533
    # condition under which granule_position -1 is conformant.  The
    # final page terminates the packet, carries total_samples as its
    # granule, and sets EOS.
    chunk_sz = 4080  # 16 * 255
    chunks = [frames[i:i + chunk_sz] for i in range(0, len(frames), chunk_sz)]
    if not chunks:
        chunks = [b""]
    for i, ch in enumerate(chunks):
        eos = i == len(chunks) - 1
        cont = 0x01 if i > 0 else 0
        pages.append(
            _page(
                (0x04 | cont) if eos else cont,
                total_samples if eos else -1,
                serial, seq, [ch], open_tail=not eos,
            )
        )
        seq += 1
    return b"".join(pages)
