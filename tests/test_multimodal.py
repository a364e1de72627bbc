"""Multimodal binary-column plumbing — real Spark transport/batching,
stubbed codecs (the decode libs aren't in this container). The fake
decoder paths exercise the full schema/partitioning/UDF shape.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from finanalyzer_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_metadata,
    decode_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image/png" if i % 2 == 0 else "video/mp4",
         bytes(range(256)) * (i + 1), None)
        for i in range(6)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_metadata_jvm_side(media):
    out = attach_metadata(media).select("media_id", "meta_computed.*").collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["n_bytes"] == 256
    assert by_id[0]["sha1"] == hashlib.sha1(bytes(range(256))).hexdigest()


def test_decode_image_features_fake_path(media):
    feats = decode_image_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 6
    for r in rows:
        v = r["feature"]
        assert len(v) == 8
        # uniform byte distribution → uniform histogram
        assert abs(sum(v) - 1.0) < 1e-5
        assert max(v) - min(v) < 1e-6


def test_decode_image_features_feeds_similarity(spark, media):
    """decoded features are a valid input to the ANN operators."""
    from finanalyzer_spark.operators.similarity import cosine_topk

    feats = decode_image_features(media, fake=True).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    probe = feats.where("vec_id = 0")
    top = cosine_topk(feats, probe, k=3)
    assert top.count() == 3


def test_real_codec_path_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        decode_image_features(media, fake=False).collect()


def test_sample_video_frames_fake_path(media):
    frames = sample_video_frames(media, every_n_bytes=64, fake=True)
    got = frames.where("media_id = 0").orderBy("frame_no").collect()
    assert len(got) == 4  # 256 bytes / 64
    assert bytes(got[0]["frame"]) == bytes(range(64))
    assert [r["frame_no"] for r in got] == [0, 1, 2, 3]
