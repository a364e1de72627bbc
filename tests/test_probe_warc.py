"""probe_media recognizes web archives (the crawl-ingest modality):
plain WARC by its version magic, .warc.gz by sniffing the first gzip
member's inflated head — and plain non-WARC gzip stays 'unknown'
(never a false archive tag)."""

from __future__ import annotations

import gzip

from finanalyzer_spark.operators.multimodal import probe_media
from finanalyzer_spark.operators.warc import (
    build_http_response,
    write_warc,
    write_warc_record,
)


def _one_record_archive(gz: bool) -> bytes:
    rec = write_warc_record(
        "response",
        build_http_response(b"<html>x</html>"),
        uri="https://example.org/x",
    )
    return write_warc([rec], gzip_members=gz)


def test_probe_identifies_plain_and_gzipped_warc():
    plain = probe_media(_one_record_archive(gz=False))
    assert (plain["kind"], plain["container"]) == ("archive", "warc")
    gzd = probe_media(_one_record_archive(gz=True))
    assert (gzd["kind"], gzd["container"]) == ("archive", "warc.gz")


def test_probe_does_not_mistake_other_gzip_for_warc():
    got = probe_media(gzip.compress(b"just text, definitely not a warc"))
    assert got["kind"] == "unknown"
    # truncated/corrupt gzip head also degrades to unknown, no raise
    assert probe_media(b"\x1f\x8b\x08\x00junk")["kind"] == "unknown"


def test_probe_avif_heif_still_images():
    """AVIF/HEIF ftyp brands route to the still-image probe: brand ->
    container, infe item type -> NAMED codec (decode refuses AV1/HEVC;
    the probe still names them, the MP3/CABAC surfacing rule), ispe ->
    dimensions. MP4 video ftyps are untouched."""
    import numpy as np

    from finanalyzer_spark.operators.mp4 import (
        encode_avif_stub,
        mux_mp4_mjpeg,
    )

    p = probe_media(encode_avif_stub(320, 200, "av1"))
    assert (p["kind"], p["container"], p["codec"]) == (
        "image", "avif", "av1",
    )
    assert (p["width"], p["height"], p["n_frames"]) == (320, 200, 1)
    p = probe_media(encode_avif_stub(64, 48, "hevc"))
    assert (p["container"], p["codec"]) == ("heif", "hevc")
    vid = np.zeros((16, 16, 3), np.uint8)
    p = probe_media(mux_mp4_mjpeg([vid], fps=10, quality=80))
    assert (p["kind"], p["container"]) == ("video", "mp4")


def test_probe_avif_malformed_meta_degrades_to_container():
    from finanalyzer_spark.operators.mp4 import encode_avif_stub

    buf = bytearray(encode_avif_stub(8, 8, "av1"))
    # corrupt the meta box size so the box walk raises
    import struct

    meta_off = bytes(buf).find(b"meta") - 4
    struct.pack_into(">I", buf, meta_off, 7)  # size < 8 → malformed
    p = probe_media(bytes(buf))
    assert p["kind"] == "image" and p["container"] == "avif"
    assert p["codec"] is None
