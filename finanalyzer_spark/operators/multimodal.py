"""Multimodal columns — image/audio/video as opaque binary + typed
metadata (BASELINE.json extension surface).

Design: media rides in a `binary` column next to a metadata struct
(mime, width/height or sample_rate/duration, byte size, content hash).
All transport/partitioning/batching is real Spark; only the codec
kernels are stubbed (the decode libraries aren't in this container):
each decode function is a `mapInPandas` kernel with the real UDF
signature, Arrow batch shape, and output schema, raising
NotImplementedError at the pixel/sample-decode step unless the
deterministic fake decoder is requested.

Scale notes:
* binary payloads make rows wide — `spark.sql.files.maxPartitionBytes`
  governs scan parallelism, and `mapInPandas` streams Arrow batches so
  an executor never holds a partition of raw media in one list.
* metadata lives in a separate (or pruned) column — predicate
  pushdown on mime/size never touches the bytes.
* feature outputs (embeddings, frames) are array<float>/binary columns
  feeding the similarity operators (operators/similarity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha1", T.StringType()),
                ]
            ),
        ),
    ]
)


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Compute byte-size + content hash metadata JVM-side (no decode)."""
    return df.withColumn(
        "meta_computed",
        F.struct(
            F.length(F.col(content_col)).alias("n_bytes"),
            F.sha1(F.col(content_col)).alias("sha1"),
        ),
    )


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Image → feature vector. Real codec path STUBBED (no PIL/cv2 in
    this environment); `fake=True` yields a deterministic byte-histogram
    feature so the full pipeline (decode → embed → ANN) is testable.

    Output: (id, feature array<float>) — feeds cosine_topk /
    hyperplane_lsh_buckets unchanged."""

    schema = f"{id_col} long, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv (not in this container); "
                    "run with fake=True for the deterministic byte-histogram path"
                )
            feats = []
            for buf in pdf[content_col]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, content_col).mapInPandas(kernel, schema=schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    every_n_bytes: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Video → sampled frame rows (one output row per frame). Real
    demux STUBBED; `fake=True` treats every `every_n_bytes` slice as a
    'frame' so the explode/batch shape is exercised end-to-end."""

    schema = f"{id_col} long, frame_no int, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video demux requires ffmpeg bindings (not in this container); "
                    "run with fake=True for the byte-slice path"
                )
            out_id, out_no, out_fr = [], [], []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                for i in range(0, len(b), every_n_bytes):
                    out_id.append(mid)
                    out_no.append(i // every_n_bytes)
                    out_fr.append(b[i : i + every_n_bytes])
            yield pd.DataFrame({id_col: out_id, "frame_no": out_no, "frame": out_fr})

    return df.select(id_col, content_col).mapInPandas(kernel, schema=schema)
