"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode kernels are STUBS (the container has no image/audio libs) —
clearly marked and swappable — but the Spark-side plumbing is real and
tested: schema contracts, batch iteration, partition-parallel shape, and
a deterministic fake "feature extractor" so pipelines are end-to-end
verifiable without the codec libraries.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real implementation would use PIL/libjpeg. Raises to make
    accidental production use loud."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this "
        "container; use fake_feature for pipeline testing"
    )


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: md5-seeded floats in [0,1).
    Replaces the decode+embed kernel with identical Spark-side shape."""
    if payload is None:
        payload = b""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(
    media: DataFrame, dim: int = 8, use_real_decode: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow batches
    keep the Python boundary amortized; per-batch numpy does the work.
    At scale this is embarrassingly parallel — partition by media_id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                if use_real_decode:
                    decode_image(b)  # raises NotImplementedError (stub)
                feats.append(fake_feature(b, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
