"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas. The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_media`` raises NotImplementedError unless a
deterministic fake decoder is requested — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a unit-norm feature vector
    derived from the payload digest. Replace with PIL/librosa/ffmpeg when
    available — the UDF signature and batch shape do not change."""
    digest = hashlib.sha256((media_type.encode() + (payload or b""))).digest()
    vec = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype("float32")
    norm = float(np.linalg.norm(vec)) or 1.0
    return vec / norm


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload, media_type)
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this container; pass fake=True for the deterministic stub"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media (MEDIA schema) -> FEATURES via mapInPandas. Arrow batches keep
    the binary payloads off the driver; partitioning is inherited from the
    scan (payload-heavy tables should be stored with small row groups)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, t, fake=fake).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURES)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame timestamp (schema-real,
    decode stubbed): frame feature = payload digest + frame index."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", IntegerType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, stamps, feats = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for ts in range(0, int(dur or 0), every_ms):
                    ids.append(mid)
                    stamps.append(ts)
                    feats.append(
                        decode_media(
                            (payload or b"") + ts.to_bytes(4, "little"), "video", fake=fake
                        ).tolist()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_ms": stamps, "feature": feats})

    return media.filter(media.media_type == "video").mapInPandas(run, schema=schema)
