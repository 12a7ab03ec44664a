"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side mechanics are real and tested — schema, partition-friendly
batch iteration (mapInPandas), Arrow batch shapes, typed metadata structs.
The actual codec work is stubbed: the container has no image/audio
libraries, so ``decode_image``/``decode_audio`` either raise
NotImplementedError (strict mode) or produce a deterministic fake feature
vector derived from the bytes (test mode) — clearly marked, swap in a real
decoder (PIL/torchaudio) on a production cluster.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField("content_type", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 32


def _fake_feature(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: crc32-seeded projection of
    the byte histogram.  STUB — replace with a real decode on a cluster
    with codec libraries installed."""
    hist = np.bincount(np.frombuffer(content, dtype=np.uint8), minlength=256).astype(
        np.float64
    )
    seed = zlib.crc32(content[:64]) & 0xFFFFFFFF
    rng = np.random.RandomState(seed % (2**31))
    proj = rng.standard_normal((256, dim))
    v = hist @ proj
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def decode_image(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "image decode requires PIL/opencv — unavailable in this container; "
        "use extract_media_features(strict=False) for the deterministic stub"
    )


def decode_audio(content: bytes) -> np.ndarray:
    raise NotImplementedError("audio decode requires soundfile/torchaudio")


def extract_media_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas over binary content → typed feature rows.

    Batch shape: iterator of pandas DataFrames (Arrow), one output row per
    input row; partitioning is preserved, so callers can pre-repartition by
    size to balance decode cost."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for content in pdf["content"]:
                raw = bytes(content)
                shas.append(hashlib.sha256(raw).hexdigest())
                if strict:
                    feats.append(decode_image(raw).tolist())
                else:
                    feats.append(_fake_feature(raw).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(gen, schema=MEDIA_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows for a
    downstream decoder; the frame arithmetic is real, the decode is stubbed.
    Assumes a 30fps/10s default when no duration metadata exists."""
    n_frames = F.least(
        F.greatest((F.col("n_bytes") / 10_000).cast("long"), F.lit(1)), F.lit(300)
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
