"""Pure-python MP4 / ISO BMFF (MPEG-4 Part 12) demuxer + MJPEG muxer.

The container layer of the remaining video gap, with no codec
library: walk the box tree (ftyp / moov / trak / mdia / minf / stbl),
reconstruct each video track's sample table from
stsz (sizes) + stco/co64 (chunk offsets) + stsc (samples-per-chunk
runs) + stts (decode timestamps) + stss (sync/keyframe table), and
yield every sample's bytes + timestamp + keyframe flag.  That is the
half of "MP4 support" a training-data pipeline needs even without a
codec: keyframe indexing, frame-rate/duration metadata, sample-level
content hashing and dedup all operate on demuxed samples, not decoded
pixels.  Decode stays tiered exactly like the other codecs
(operators/multimodal.py): MJPEG samples ('jpeg' sample entries, or
anything carrying the FFD8 magic) decode through the pure JPEG
decoder; avc1 tracks expose their avcC parameter sets
(`parse_avcc` / `avc_track_info` — resolution/profile/keyframe
metadata for ANY H.264-in-MP4) and re-frame to Annex-B
(`mp4_avc_to_annexb`), so the pure tier of operators/h264.py
(+h264_cavlc/h264_inter) decodes I_PCM, CAVLC-intra and
16x16-partition P tracks fully; other inter shapes (partitioned
MBs, multi-ref, weighted, B, CABAC) route to the PyAV tier.

`mux_mp4_mjpeg` is the encoder twin (fixture builder): a minimal
ftyp + mdat + moov file with a 'jpeg' VisualSampleEntry (the
QuickTime-lineage MJPEG layout ffmpeg also writes for `-c:v mjpeg`),
one sample per chunk, every sample a keyframe.  Spec grounding:
ISO/IEC 14496-12 box layout; all integers big-endian.

Reference context: the reference repo has no media surface — this is
extended training-data-pipeline tier (SURVEY.md Phase 5 scope).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_FULLBOX = {
    b"mvhd", b"tkhd", b"mdhd", b"hdlr", b"vmhd", b"dref", b"stsd",
    b"stts", b"stsc", b"stsz", b"stco", b"co64", b"stss",
}

#: containers whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
}


def _boxes(buf: bytes, lo: int, hi: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_lo, body_hi) for the boxes in buf[lo:hi]."""
    pos = lo
    while pos + 8 <= hi:
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        btype = buf[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = hi - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > hi:
            raise ValueError("malformed MP4 box")
        yield btype, body, pos + size
        pos += size


def _find(buf: bytes, lo: int, hi: int, btype: bytes):
    for t, blo, bhi in _boxes(buf, lo, hi):
        if t == btype:
            return blo, bhi
    return None


def _need(buf: bytes, lo: int, hi: int, btype: bytes) -> tuple[int, int]:
    """_find for MANDATORY boxes: a structurally valid track always has
    tkhd/mdia/.../stts (ISO 14496-12 §8.3-8.6), so absence means the
    file is malformed — raise ValueError (the contract demux callers
    catch to fall through to the PyAV tier) instead of returning None
    and letting the caller crash on a TypeError subscript."""
    found = _find(buf, lo, hi, btype)
    if found is None:
        raise ValueError(
            f"malformed MP4: mandatory {btype.decode('latin-1')} box missing"
        )
    return found


def _u32s(buf: bytes, lo: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", buf[lo : lo + 4 * n]))


def demux_mp4(buf: bytes):
    """Walk an ISO BMFF file and yield, for every sample of every
    VIDEO track, ``(track_id, sample_no, ts_us, is_sync, fourcc,
    sample_bytes)`` in decode order.  ts_us is the decode timestamp in
    microseconds (from stts + the track's mdhd timescale); is_sync is
    True for keyframes (all samples, if no stss box is present — the
    spec default).  ValueError on non-BMFF payloads so callers can
    route other containers elsewhere."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) byte stream")
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("MP4 without moov box")
    for t, tlo, thi in _boxes(buf, *moov):
        if t != b"trak":
            continue
        tkhd = _need(buf, tlo, thi, b"tkhd")
        version = buf[tkhd[0]]
        track_id = struct.unpack(
            ">I", buf[tkhd[0] + (20 if version else 12) :][:4]
        )[0]
        mdia = _need(buf, tlo, thi, b"mdia")
        hdlr = _need(buf, *mdia, b"hdlr")
        handler = buf[hdlr[0] + 8 : hdlr[0] + 12]
        if handler != b"vide":
            continue
        mdhd = _need(buf, *mdia, b"mdhd")
        mv = buf[mdhd[0]]
        timescale = struct.unpack(
            ">I", buf[mdhd[0] + (20 if mv else 12) :][:4]
        )[0]
        minf = _need(buf, *mdia, b"minf")
        stbl = _need(buf, *minf, b"stbl")

        stsd = _need(buf, *stbl, b"stsd")
        # first sample entry's fourcc: stsd fullbox header (8) + entry
        # size (4) + fourcc (4)
        fourcc = buf[stsd[0] + 12 : stsd[0] + 16]

        slo, _shi = _need(buf, *stbl, b"stsz")
        sample_size, sample_count = struct.unpack(
            ">II", buf[slo + 4 : slo + 12]
        )
        if sample_size:
            sizes = [sample_size] * sample_count
        else:
            sizes = _u32s(buf, slo + 12, sample_count)

        co = _find(buf, *stbl, b"stco")
        if co is not None:
            (n_chunks,) = struct.unpack(">I", buf[co[0] + 4 : co[0] + 8])
            offsets = _u32s(buf, co[0] + 8, n_chunks)
        else:
            co = _need(buf, *stbl, b"co64")
            (n_chunks,) = struct.unpack(">I", buf[co[0] + 4 : co[0] + 8])
            offsets = list(
                struct.unpack(f">{n_chunks}Q", buf[co[0] + 8 :][: 8 * n_chunks])
            )

        sclo, _ = _need(buf, *stbl, b"stsc")
        (n_runs,) = struct.unpack(">I", buf[sclo + 4 : sclo + 8])
        runs = [
            struct.unpack(">III", buf[sclo + 8 + 12 * i : sclo + 20 + 12 * i])
            for i in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_index)

        ttlo, _ = _need(buf, *stbl, b"stts")
        (n_tt,) = struct.unpack(">I", buf[ttlo + 4 : ttlo + 8])
        tt = [
            struct.unpack(">II", buf[ttlo + 8 + 8 * i : ttlo + 16 + 8 * i])
            for i in range(n_tt)
        ]  # (sample_count, delta)

        ss = _find(buf, *stbl, b"stss")
        if ss is None:
            sync = None  # every sample is a keyframe (spec 8.6.2)
        else:
            (n_ss,) = struct.unpack(">I", buf[ss[0] + 4 : ss[0] + 8])
            sync = set(_u32s(buf, ss[0] + 8, n_ss))  # 1-based

        # samples-per-chunk for every chunk from the stsc runs
        per_chunk = []
        for ri, (first, spc, _d) in enumerate(runs):
            last = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
            )
            per_chunk += [spc] * (last - first + 1)

        # decode timestamps from stts deltas
        ts, acc = [], 0
        for cnt, delta in tt:
            for _ in range(cnt):
                ts.append(acc)
                acc += delta

        sno = 0
        for ci, chunk_off in enumerate(offsets):
            pos = chunk_off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if sno >= sample_count:
                    break
                size = sizes[sno]
                is_sync = sync is None or (sno + 1) in sync
                ts_us = (
                    ts[sno] * 1_000_000 // timescale
                    if sno < len(ts) and timescale
                    else 0
                )
                yield (
                    track_id, sno, ts_us, is_sync, fourcc.decode("latin1"),
                    buf[pos : pos + size],
                )
                pos += size
                sno += 1


def mux_mp4_mjpeg(frames, fps: int = 25, quality: int = 90) -> bytes:
    """Minimal MJPEG-in-MP4 writer (the demux twin / fixture builder):
    every frame JPEG-encoded independently (operators/jpeg) into mdat,
    one sample per chunk, a 'jpeg' VisualSampleEntry in stsd, every
    sample a sync sample (no stss box — the spec default)."""
    import numpy as np

    from .jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    timescale = fps * 1000
    delta = 1000  # per-frame duration in timescale units
    n = len(payloads)

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    def full(btype: bytes, payload: bytes, version=0, flags=0) -> bytes:
        return box(btype, struct.pack(">I", (version << 24) | flags) + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    # mdat directly after ftyp → chunk offsets are ftyp+8 plus running
    mdat_body = b"".join(payloads)
    mdat = box(b"mdat", mdat_body)
    data_base = len(ftyp) + 8
    offsets = []
    acc = data_base
    for p in payloads:
        offsets.append(acc)
        acc += len(p)

    duration = n * delta
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", w << 16, h << 16),
        flags=0x7,  # enabled | in movie | in preview
    )
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00"
    )
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = full(
        b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1)
    )
    dinf = box(b"dinf", dref)
    # 'jpeg' VisualSampleEntry: 6 reserved + data_ref_index, then the
    # 70-byte visual sample entry body (14496-12 §12.1.3)
    vse_body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0)  # pre_defined, reserved
        + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    jpeg_entry = box(b"jpeg", vse_body)
    stsd = full(b"stsd", struct.pack(">I", 1) + jpeg_entry)
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = full(
        b"stco",
        struct.pack(">I", n)
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def parse_avcc(avcc: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.2.4.1) →
    {nal_length_size, sps: [...], pps: [...], profile, level}.  The
    sps/pps lists hold COMPLETE NAL units exactly as stored in the
    record — header byte + escaped EBSP payload, NOT unescaped RBSP;
    callers that need RBSP fields must strip the header byte and
    undo emulation-prevention themselves (see `_annexb_unescape`).
    This is how H.264 parameter sets travel inside MP4 'avc1' sample
    entries (out-of-band, unlike Annex-B's in-band SPS/PPS NALs)."""
    import struct as _s

    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")
    nal_len = (avcc[4] & 0x3) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps = []
    for _ in range(n_sps):
        (ln,) = _s.unpack(">H", avcc[pos : pos + 2])
        sps.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = _s.unpack(">H", avcc[pos : pos + 2])
        pps.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    return {
        "nal_length_size": nal_len,
        "profile_idc": avcc[1],
        "level_idc": avcc[3],
        "sps": sps,
        "pps": pps,
    }


def avc_track_info(buf: bytes) -> dict | None:
    """Resolution/profile/keyframe metadata for the first avc1 video
    track of an MP4, from the avcC record + the sample tables — the
    codec-metadata pass for H.264-in-MP4 corpora, no codec library.
    Returns None when no avc1 track exists."""
    from .h264 import parse_sps

    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("MP4 without moov box")
    for t, tlo, thi in _boxes(buf, *moov):
        if t != b"trak":
            continue
        mdia = _need(buf, tlo, thi, b"mdia")
        hdlr = _need(buf, *mdia, b"hdlr")
        if buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _need(buf, *mdia, b"minf")
        stbl = _need(buf, *minf, b"stbl")
        stsd = _need(buf, *stbl, b"stsd")
        if buf[stsd[0] + 12 : stsd[0] + 16] != b"avc1":
            continue
        # sample entry body: 8 (size+fourcc) + 78 (VisualSampleEntry)
        # then child boxes (avcC, ...)
        entry_lo = stsd[0] + 8
        (entry_size,) = struct.unpack(">I", buf[entry_lo : entry_lo + 4])
        avcc = _find(buf, entry_lo + 86, entry_lo + entry_size, b"avcC")
        if avcc is None:
            return None
        cfg = parse_avcc(buf[avcc[0] : avcc[1]])
        sps = parse_sps(_annexb_unescape(cfg["sps"][0]))
        entropy = None
        if cfg["pps"]:
            from .h264 import parse_pps

            try:
                pps = parse_pps(_annexb_unescape(cfg["pps"][0]))
                entropy = (
                    "cabac" if pps["entropy_coding_mode"] else "cavlc"
                )
            except (ValueError, IndexError):
                entropy = None
        # sample/keyframe counts come from two integers in the
        # already-parsed table headers — a metadata probe must never
        # slice every sample's payload out of the buffer
        stsz = _need(buf, *stbl, b"stsz")
        (n_samples,) = struct.unpack(
            ">I", buf[stsz[0] + 8 : stsz[0] + 12]
        )
        stss = _find(buf, *stbl, b"stss")
        if stss is None:
            n_sync = n_samples  # no stss → every sample is sync
        else:
            (n_sync,) = struct.unpack(
                ">I", buf[stss[0] + 4 : stss[0] + 8]
            )
        return {
            "width": sps["width"],
            "height": sps["height"],
            "profile_idc": cfg["profile_idc"],
            "level_idc": cfg["level_idc"],
            "nal_length_size": cfg["nal_length_size"],
            "n_samples": n_samples,
            "n_keyframes": n_sync,
            # CABAC tracks refuse in the pure decode tier; the probe
            # names the entropy mode so the refusal is explicable
            "entropy": entropy,
        }
    return None


def _annexb_unescape(ebsp_with_header: bytes) -> bytes:
    """avcC stores whole NAL units (header byte + EBSP); strip the
    header and remove emulation-prevention bytes for the SPS parser."""
    from .h264 import _unescape

    return _unescape(ebsp_with_header[1:])


def split_length_prefixed_nals(sample: bytes, nal_length_size: int = 4):
    """MP4 'avc1' samples carry length-prefixed NAL units instead of
    Annex-B start codes; yield (nal_type, rbsp) per NAL."""
    from .h264 import _unescape

    pos = 0
    while pos + nal_length_size <= len(sample):
        ln = int.from_bytes(sample[pos : pos + nal_length_size], "big")
        pos += nal_length_size
        nal = sample[pos : pos + ln]
        pos += ln
        if nal:
            yield nal[0] & 0x1F, _unescape(nal[1:])


def mux_mp4_avc(
    frames,
    fps: int = 25,
    codec: str = "ipcm",
    qp: int = 28,
    annexb: bytes | None = None,
) -> bytes:
    """H.264-in-MP4 writer (fixture twin for the avc1 path): frames
    are encoded with operators/h264.encode_h264_ipcm (codec="ipcm",
    spec-valid IDR-only I_PCM baseline, lossless) or
    operators/h264_cavlc.encode_h264_intra (codec="intra",
    CAVLC-entropy spatial-prediction intra at `qp`) or
    operators/h264_inter.encode_h264_video (codec="video",
    IDR + motion-compensated P frames); parameter sets land
    out-of-band in the avcC record, and each sample is one
    length-prefixed coded picture.  Unlike the MJPEG twin this writes
    an EXPLICIT stss (sync samples = IDR pictures — every sample for
    the all-intra codecs, one per GOP for "video"), so the sync-table
    parse path is exercised too.  Pass `annexb` to mux an EXISTING
    Annex-B stream instead (frames is then ignored; dimensions come
    from the stream's own SPS)."""
    from .h264 import build_avcc, encode_h264_ipcm

    import numpy as np

    if annexb is not None:
        from .h264 import parse_sps, split_annexb

        sps = next(
            parse_sps(rbsp)
            for t, _r, rbsp in split_annexb(annexb)
            if t == 7
        )
        h, w = sps["height"], sps["width"]
    else:
        frames = [np.asarray(f, dtype=np.uint8) for f in frames]
        h, w, _ = frames[0].shape
        if codec == "ipcm":
            annexb = encode_h264_ipcm(frames)
        elif codec == "intra":
            from .h264_cavlc import encode_h264_intra

            annexb = encode_h264_intra(frames, qp=qp)
        elif codec == "video":  # IDR + motion-compensated P frames
            from .h264_inter import encode_h264_video

            annexb = encode_h264_video(frames, qp=qp)
        else:
            raise ValueError(f"unknown avc fixture codec {codec!r}")
    avcc, samples = build_avcc(annexb)
    # sync samples = those whose first NAL is an IDR (every sample for
    # the all-intra codecs; one per GOP for codec="video")
    sync_idx = [
        i + 1 for i, s in enumerate(samples) if (s[4] & 0x1F) == 5
    ]

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    def full(btype: bytes, payload: bytes, version=0, flags=0) -> bytes:
        return box(btype, struct.pack(">I", (version << 24) | flags) + payload)

    timescale = fps * 1000
    delta = 1000
    n = len(samples)
    duration = n * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    mdat = box(b"mdat", b"".join(samples))
    data_base = len(ftyp) + 8
    offsets, acc = [], data_base
    for s in samples:
        offsets.append(acc)
        acc += len(s)

    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
        flags=0x7,
    )
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"h264\x00"
    )
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dinf = box(b"dinf", full(b"dref", struct.pack(">I", 1)
                             + full(b"url ", b"", flags=1)))
    vse_body = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0)
        + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    avc1 = box(b"avc1", vse_body + box(b"avcC", avcc))
    stsd = full(b"stsd", struct.pack(">I", 1) + avc1)
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    # ctts composition offsets (pts - dts) for reordered (B-GOP)
    # streams: samples are stored in decode order, so presentation
    # times come from POC display order; ctts v0 offsets are unsigned,
    # so the whole track shifts by the max reorder depth (the standard
    # v0 layout).  Streams without reordering skip the box entirely.
    from .h264 import display_order_from_annexb

    disp = display_order_from_annexb(annexb)
    ctts = b""
    if disp != list(range(n)):
        shift = max(i - d for i, d in enumerate(disp))
        offs = [(disp[i] - i + shift) * delta for i in range(n)]
        entries = []  # run-length (count, offset) pairs
        for o in offs:
            if entries and entries[-1][1] == o:
                entries[-1][0] += 1
            else:
                entries.append([1, o])
        ctts = full(
            b"ctts",
            struct.pack(">I", len(entries))
            + b"".join(struct.pack(">II", c, o) for c, o in entries),
        )
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = full(
        b"stco",
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stss = full(
        b"stss",
        struct.pack(">I", len(sync_idx))
        + b"".join(struct.pack(">I", i) for i in sync_idx),
    )
    stbl = box(b"stbl", stsd + stts + ctts + stsc + stsz + stco + stss)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_avc_to_annexb(buf: bytes) -> bytes:
    """Reconstruct an Annex-B elementary stream from an MP4's first
    avc1 track: out-of-band SPS/PPS from the avcC record, then every
    sample's length-prefixed NALs re-framed with start codes — the
    bridge that lets any Annex-B consumer (the pure intra decoder,
    or an external conformance decoder) read H.264-in-MP4 directly."""
    from .h264 import annexb_from_avcc

    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("MP4 without moov box")
    cfg = None
    for t, tlo, thi in _boxes(buf, *moov):
        if t != b"trak":
            continue
        mdia = _need(buf, tlo, thi, b"mdia")
        minf = _find(buf, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _need(buf, *minf, b"stbl")
        stsd = _need(buf, *stbl, b"stsd")
        if buf[stsd[0] + 12 : stsd[0] + 16] != b"avc1":
            continue
        entry_lo = stsd[0] + 8
        (entry_size,) = struct.unpack(">I", buf[entry_lo : entry_lo + 4])
        avcc = _need(buf, entry_lo + 86, entry_lo + entry_size, b"avcC")
        cfg = parse_avcc(buf[avcc[0] : avcc[1]])
        break
    if cfg is None:
        raise ValueError("no avc1 video track")
    return annexb_from_avcc(
        cfg,
        (
            sample
            for _tid, _no, _ts, _sync, fourcc, sample in demux_mp4(buf)
            if fourcc == "avc1"
        ),
    )


# --------------------------------------------------------------------------
# ISO-BMFF still images: AVIF / HEIF probing (round 9)
# --------------------------------------------------------------------------
_BMFF_IMAGE_BRANDS = {
    b"avif": "av1", b"avis": "av1",
    b"heic": "hevc", b"heix": "hevc", b"mif1": None,
}


def probe_isobmff_image(buf: bytes):
    """AVIF/HEIF metadata probe (no pixel decode — AV1/HEVC entropy
    decode is out of the pure tier's scope, like CABAC): ftyp brand ->
    codec, meta/iprp/ipco/ispe -> dimensions, iinf/infe item types
    refine the codec and count image items. Returns None when the
    ftyp brand is not a still-image brand; raises ValueError on a
    malformed meta tree (probe_media degrades that to container-only).

    Layout per ISO/IEC 23008-12 (HEIF) and the AV1-ISOBMFF (AVIF)
    bindings: `meta` is a FullBox (4-byte version/flags prefix before
    its children); `ispe` is a FullBox carrying 32-bit width/height.
    """
    if len(buf) < 16 or buf[4:8] != b"ftyp":
        return None
    (ftyp_size,) = struct.unpack(">I", buf[:4])
    major = buf[8:12]
    compat = [
        buf[i:i + 4] for i in range(16, min(ftyp_size, len(buf)), 4)
    ]
    brand = None
    for b in [major, *compat]:
        if b in _BMFF_IMAGE_BRANDS:
            brand = b
            break
    if brand is None:
        return None
    codec = _BMFF_IMAGE_BRANDS[brand]
    container = "avif" if brand in (b"avif", b"avis") else "heif"
    meta = _find(buf, 0, len(buf), b"meta")
    if meta is None:
        raise ValueError(f"{container} without a meta box")
    mlo, mhi = meta
    mlo += 4  # meta is a FullBox: skip version/flags
    width = height = None
    iprp = _find(buf, mlo, mhi, b"iprp")
    if iprp is not None:
        ipco = _find(buf, iprp[0], iprp[1], b"ipco")
        if ipco is not None:
            for t, blo, bhi in _boxes(buf, ipco[0], ipco[1]):
                if t == b"ispe" and bhi - blo >= 12:
                    width, height = struct.unpack_from(">II", buf, blo + 4)
                    break
    n_items = 0
    iinf = _find(buf, mlo, mhi, b"iinf")
    if iinf is not None:
        # iinf is a FullBox; entry_count is 16-bit in version 0 and
        # 32-bit otherwise
        ver = buf[iinf[0]]
        skip = 4 + (2 if ver == 0 else 4)
        for t, blo, bhi in _boxes(buf, iinf[0] + skip, iinf[1]):
            if t == b"infe" and bhi - blo >= 12:
                item_type = buf[blo + 8:blo + 12]
                if item_type in (b"av01", b"hvc1"):
                    n_items += 1
                    codec = {b"av01": "av1", b"hvc1": "hevc"}[item_type]
    return {
        "container": container, "codec": codec,
        "width": width, "height": height,
        "n_items": n_items or None,
    }


def encode_avif_stub(width: int, height: int, codec: str = "av1") -> bytes:
    """Spec-shaped AVIF/HEIF header structure (ftyp + meta{hdlr, pitm,
    iinf/infe, iprp{ipco{ispe}, ipma}} + empty mdat) — a PROBE fixture
    like encode_mpeg_audio_stub: the decode tier refuses AV1/HEVC
    payloads, this exists so probe_isobmff_image's box walk is
    testable against known dimensions/brands."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    if codec == "av1":
        major, item = b"avif", b"av01"
    elif codec == "hevc":
        major, item = b"heic", b"hvc1"
    else:
        raise ValueError(f"unknown still-image codec {codec!r}")
    ftyp = box(b"ftyp", major + struct.pack(">I", 0) + major + b"mif1")
    hdlr = box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"pict"
               + b"\x00" * 12 + b"\x00")
    pitm = box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 1))
    infe = box(b"infe", b"\x02\x00\x00\x00" + struct.pack(">HH", 1, 0)
               + item + b"\x00")
    iinf = box(b"iinf", b"\x00\x00\x00\x00" + struct.pack(">H", 1) + infe)
    ispe = box(b"ispe", b"\x00\x00\x00\x00"
               + struct.pack(">II", width, height))
    ipco = box(b"ipco", ispe)
    ipma = box(b"ipma", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
               + struct.pack(">H", 1) + b"\x01\x81")
    iprp = box(b"iprp", ipco + ipma)
    meta = box(b"meta", b"\x00\x00\x00\x00" + hdlr + pitm + iinf + iprp)
    mdat = box(b"mdat", b"")
    return ftyp + meta + mdat
