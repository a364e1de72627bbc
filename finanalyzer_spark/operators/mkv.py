"""Pure-python Matroska / WebM (EBML) demuxer + minimal muxer twin.

Completes the container pair next to operators/mp4.py: walk the EBML
element tree (header → Segment → Info/Tracks/Clusters), read each
video track's codec id / dimensions / CodecPrivate, and yield every
SimpleBlock's payload with its absolute timestamp and keyframe flag.
Same tier posture as the MP4 layer: block-level indexing and
content-hash dedup are codec-agnostic; V_MJPEG blocks decode through
the pure JPEG decoder; V_MPEG4/ISO/AVC tracks expose their avcC
CodecPrivate (re-framed to Annex-B like mp4_avc_to_annexb), so the
pure tier of operators/h264.py (+h264_cavlc/h264_inter) decodes
I_PCM, CAVLC-intra, every P partition shape (multi-reference
included) and the full B tier; CABAC / long-term-reference tracks
route to PyAV.

Spec grounding: RFC 8794 (EBML) + the public Matroska element
registry (matroska.org/technical/elements): vint-coded ids keep the
length-marker bit, vint-coded sizes strip it; SimpleBlock =
vint track number + s16 relative timestamp + flags (0x80 keyframe,
lacing bits 0x06) + frame data.  The muxer writes explicit sizes (no
unknown-size elements) and no lacing.

Reference context: the reference repo has no media surface — extended
training-data-pipeline tier.
"""

from __future__ import annotations

import struct

EBML_MAGIC = b"\x1aE\xdf\xa3"

_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB


def _read_vint(buf: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at pos → (value, next_pos)."""
    first = buf[pos]
    length = 1
    mask = 0x80
    while mask and not (first & mask):
        length += 1
        mask >>= 1
    if not mask or pos + length > len(buf):
        raise ValueError("malformed EBML vint")
    v = first if keep_marker else first & (mask - 1)
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    return v, pos + length


def _elements(buf: bytes, lo: int, hi: int):
    """Yield (element_id, body_lo, body_hi) for elements in buf[lo:hi]."""
    pos = lo
    while pos < hi:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        if pos + size > hi:
            raise ValueError("EBML element overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, lo: int, hi: int) -> int:
    v = 0
    for b in buf[lo:hi]:
        v = (v << 8) | b
    return v


def parse_mkv_tracks(buf: bytes) -> dict:
    """Segment metadata: {timestamp_scale_ns, tracks: {num: {codec_id,
    width, height, codec_private}}}.  ValueError on non-EBML input so
    callers can route other containers elsewhere."""
    if buf[:4] != EBML_MAGIC:
        raise ValueError("not an EBML (Matroska/WebM) byte stream")
    seg = None
    for eid, lo, hi in _elements(buf, 0, len(buf)):
        if eid == _SEGMENT:
            seg = (lo, hi)
            break
    if seg is None:
        raise ValueError("EBML without Segment element")
    scale = 1_000_000  # spec default: 1 ms in ns
    tracks: dict[int, dict] = {}
    for eid, lo, hi in _elements(buf, *seg):
        if eid == _INFO:
            for iid, ilo, ihi in _elements(buf, lo, hi):
                if iid == _TIMESTAMP_SCALE:
                    scale = _uint(buf, ilo, ihi)
        elif eid == _TRACKS:
            for tid, tlo, thi in _elements(buf, lo, hi):
                if tid != _TRACK_ENTRY:
                    continue
                t = {"codec_id": None, "width": None, "height": None,
                     "codec_private": None, "type": None}
                num = None
                for fid, flo, fhi in _elements(buf, tlo, thi):
                    if fid == _TRACK_NUMBER:
                        num = _uint(buf, flo, fhi)
                    elif fid == _TRACK_TYPE:
                        t["type"] = _uint(buf, flo, fhi)
                    elif fid == _CODEC_ID:
                        t["codec_id"] = buf[flo:fhi].decode("ascii")
                    elif fid == _CODEC_PRIVATE:
                        t["codec_private"] = buf[flo:fhi]
                    elif fid == _VIDEO:
                        for vid, vlo, vhi in _elements(buf, flo, fhi):
                            if vid == _PIXEL_WIDTH:
                                t["width"] = _uint(buf, vlo, vhi)
                            elif vid == _PIXEL_HEIGHT:
                                t["height"] = _uint(buf, vlo, vhi)
                if num is not None:
                    tracks[num] = t
    return {"timestamp_scale_ns": scale, "tracks": tracks}


def demux_mkv(buf: bytes):
    """Yield (track_num, block_no, ts_us, is_key, frame_bytes) for
    every SimpleBlock, timestamps absolute (cluster base + s16
    relative, scaled by TimestampScale).  Laced blocks raise
    NotImplementedError (the muxer twin never laces; real-world laced
    audio routes to PyAV)."""
    meta = parse_mkv_tracks(buf)
    scale = meta["timestamp_scale_ns"]
    seg = None
    for eid, lo, hi in _elements(buf, 0, len(buf)):
        if eid == _SEGMENT:
            seg = (lo, hi)
            break
    def _block(clo: int, chi: int, base_ts: int, is_key: bool | None):
        """Parse one (Simple)Block body; is_key=None → read the
        SimpleBlock keyframe flag, else use the given value (Block in
        a BlockGroup: keyframe = no ReferenceBlock sibling)."""
        track, pos = _read_vint(buf, clo, keep_marker=False)
        (rel,) = struct.unpack(">h", buf[pos : pos + 2])
        flags = buf[pos + 2]
        if flags & 0x06:
            raise NotImplementedError("laced Matroska blocks")
        key = bool(flags & 0x80) if is_key is None else is_key
        ts_us = (base_ts + rel) * scale // 1000
        return track, ts_us, key, buf[pos + 3 : chi]

    block_no = 0
    for eid, lo, hi in _elements(buf, *seg):
        if eid != _CLUSTER:
            continue
        base_ts = 0
        for cid, clo, chi in _elements(buf, lo, hi):
            if cid == _CLUSTER_TS:
                base_ts = _uint(buf, clo, chi)
            elif cid == _SIMPLE_BLOCK:
                track, ts_us, key, frame = _block(clo, chi, base_ts, None)
                yield track, block_no, ts_us, key, frame
                block_no += 1
            elif cid == _BLOCK_GROUP:
                # the mkvmerge/ffmpeg layout for frames with durations
                # or references: Block + optional ReferenceBlock(s);
                # keyframe iff no ReferenceBlock (Matroska spec)
                blk = None
                has_ref = False
                for gid, glo, ghi in _elements(buf, clo, chi):
                    if gid == _BLOCK:
                        blk = (glo, ghi)
                    elif gid == _REFERENCE_BLOCK:
                        has_ref = True
                if blk is not None:
                    track, ts_us, _k, frame = _block(
                        blk[0], blk[1], base_ts, not has_ref
                    )
                    yield track, block_no, ts_us, not has_ref, frame
                    block_no += 1


def mkv_track_index(buf: bytes) -> dict:
    """Codec-agnostic stream metadata: per-track codec/dimensions +
    block/keyframe census — the 'what is this video' pass, no codec
    library (H.264 tracks additionally carry avcC in codec_private,
    parseable with operators/mp4.parse_avcc)."""
    meta = parse_mkv_tracks(buf)
    n_blocks: dict[int, int] = {}
    n_key: dict[int, int] = {}
    for track, _no, _ts, is_key, _frame in demux_mkv(buf):
        n_blocks[track] = n_blocks.get(track, 0) + 1
        n_key[track] = n_key.get(track, 0) + int(is_key)

    def _entropy(t: dict):
        # AVC tracks: name the entropy mode from the avcC PPS so a
        # CABAC track's pure-tier decode refusal is explicable at
        # probe time
        if t["codec_id"] != "V_MPEG4/ISO/AVC" or not t["codec_private"]:
            return None
        try:
            from .h264 import parse_pps
            from .mp4 import _annexb_unescape, parse_avcc

            cfg = parse_avcc(t["codec_private"])
            if not cfg["pps"]:
                return None
            pps = parse_pps(_annexb_unescape(cfg["pps"][0]))
            return "cabac" if pps["entropy_coding_mode"] else "cavlc"
        except (ValueError, IndexError):
            return None

    return {
        "timestamp_scale_ns": meta["timestamp_scale_ns"],
        "tracks": {
            num: {
                "codec_id": t["codec_id"],
                "width": t["width"],
                "height": t["height"],
                "n_blocks": n_blocks.get(num, 0),
                "n_keyframes": n_key.get(num, 0),
                "entropy": _entropy(t),
            }
            for num, t in meta["tracks"].items()
        },
    }


def _vint_size(v: int) -> bytes:
    """Encode a SIZE vint (marker bit stripped) in the fewest bytes."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            out = bytearray(length)
            acc = v | (1 << (7 * length))
            for i in range(length - 1, -1, -1):
                out[i] = acc & 0xFF
                acc >>= 8
            return bytes(out)
    raise ValueError("vint too large")


def _eid(eid: int) -> bytes:
    """Element ids are stored verbatim (marker bit included)."""
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def mux_mkv(frames_or_samples, codec: str = "mjpeg", fps: int = 25,
            quality: int = 90) -> bytes:
    """Minimal Matroska writer (the demux twin / fixture builder).

    codec='mjpeg': frames are (h, w, 3) uint8 RGB, each JPEG-encoded
    into its own keyframe SimpleBlock under a V_MJPEG track.
    codec='avc': frames go through operators/h264.encode_h264_ipcm;
    the track is V_MPEG4/ISO/AVC with the avcC record in CodecPrivate
    and length-prefixed IDR NALs per block — the same layout ffmpeg
    writes for MKV H.264."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames_or_samples]
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    codec_private = b""
    if codec == "mjpeg":
        from .jpeg import encode_jpeg

        codec_id = b"V_MJPEG"
        payloads = [encode_jpeg(f, quality=quality) for f in frames]
    elif codec == "avc":
        from .h264 import build_avcc, encode_h264_ipcm

        codec_id = b"V_MPEG4/ISO/AVC"
        codec_private, payloads = build_avcc(encode_h264_ipcm(frames))
    else:
        raise ValueError(f"unsupported muxer codec {codec!r}")
    keyflags = [0x80] * len(payloads)
    return _mux_mkv_payloads(codec_id, codec_private, payloads,
                             keyflags, w, h, fps)


def mux_mkv_avc_stream(annexb: bytes, width: int, height: int,
                       fps: int = 25) -> bytes:
    """Mux an EXISTING Annex-B H.264 stream (e.g. a B-GOP or
    multi-reference stream from encode_h264_video) into Matroska:
    samples stay in decode order, and each SimpleBlock's keyframe
    flag reflects its NAL type (IDR → keyframe, others not) — the
    honest census a keyframe index reads back.  Block timestamps are
    PRESENTATION times (Matroska semantics): for B-GOP streams whose
    decode order differs from display order they are derived from POC
    via h264.display_order_from_annexb, so external players render
    the frames in the right order."""
    from .h264 import (
        NAL_IDR,
        build_avcc,
        display_order_from_annexb,
        split_annexb,
    )

    codec_private, payloads = build_avcc(annexb)
    kinds = [t for t, _r, _ in split_annexb(annexb) if t in (1, NAL_IDR)]
    keyflags = [0x80 if t == NAL_IDR else 0x00 for t in kinds]
    return _mux_mkv_payloads(
        b"V_MPEG4/ISO/AVC", codec_private, payloads, keyflags,
        width, height, fps,
        display_order=display_order_from_annexb(annexb),
    )


def _mux_mkv_payloads(codec_id: bytes, codec_private: bytes, payloads,
                      keyflags, w: int, h: int, fps: int,
                      display_order: list | None = None) -> bytes:

    ebml = _el(
        0x1A45DFA3,
        _el_uint(0x4286, 1)        # EBMLVersion
        + _el_uint(0x42F7, 1)      # EBMLReadVersion
        + _el_uint(0x42F2, 4)      # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)      # EBMLMaxSizeLength
        + _el(0x4282, b"matroska")  # DocType
        + _el_uint(0x4287, 4)      # DocTypeVersion
        + _el_uint(0x4285, 2),     # DocTypeReadVersion
    )
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _el(0x4D80, b"finanalyzer_spark")  # MuxingApp
        + _el(0x5741, b"finanalyzer_spark"),  # WritingApp
    )
    track_body = (
        _el_uint(_TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)      # TrackUID
        + _el_uint(_TRACK_TYPE, 1)  # video
        + _el(_CODEC_ID, codec_id)
        + (_el(_CODEC_PRIVATE, codec_private) if codec_private else b"")
        + _el(_VIDEO, _el_uint(_PIXEL_WIDTH, w) + _el_uint(_PIXEL_HEIGHT, h))
    )
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, track_body))
    # SimpleBlock relative timestamps are s16, so a long clip needs a
    # new Cluster (fresh ClusterTimestamp base) before +/-32767 ms is
    # exceeded; chunk well below the limit
    ms_per_frame = max(1, 1000 // fps) if fps else 40
    per_cluster = max(1, 30_000 // ms_per_frame)
    # Matroska block timestamps are PRESENTATION times; samples stay
    # in decode order, so a reordered (B-GOP) stream carries a
    # per-sample display index.  The s16 block field is relative to
    # the cluster base — base on the cluster's earliest PTS so the
    # bounded reorder offset always fits.
    pts_ms = [
        (display_order[i] if display_order is not None else i)
        * ms_per_frame
        for i in range(len(payloads))
    ]
    clusters = b""
    for c0 in range(0, len(payloads), per_cluster):
        chunk = payloads[c0 : c0 + per_cluster]
        base = min(pts_ms[c0 : c0 + len(chunk)])
        blocks = b""
        for i, p in enumerate(chunk):
            blocks += _el(
                _SIMPLE_BLOCK,
                _vint_size(1) + struct.pack(">h", pts_ms[c0 + i] - base)
                + bytes([keyflags[c0 + i]]) + p,
            )
        clusters += _el(_CLUSTER, _el_uint(_CLUSTER_TS, base) + blocks)
    segment = _el(_SEGMENT, info + tracks + clusters)
    return ebml + segment


def mkv_avc_to_annexb(buf: bytes) -> bytes:
    """Annex-B elementary stream from the first V_MPEG4/ISO/AVC track:
    out-of-band SPS/PPS from the avcC CodecPrivate, then each block's
    length-prefixed NALs re-framed with start codes — the MKV sibling
    of operators/mp4.mp4_avc_to_annexb."""
    from .mp4 import parse_avcc

    meta = parse_mkv_tracks(buf)
    track_num = cfg = None
    for num, t in meta["tracks"].items():
        if t["codec_id"] == "V_MPEG4/ISO/AVC" and t["codec_private"]:
            track_num = num
            cfg = parse_avcc(t["codec_private"])
            break
    if cfg is None:
        raise ValueError("no V_MPEG4/ISO/AVC track with CodecPrivate")
    from .h264 import annexb_from_avcc

    return annexb_from_avcc(
        cfg,
        (
            frame
            for track, _no, _ts, _key, frame in demux_mkv(buf)
            if track == track_num
        ),
    )
