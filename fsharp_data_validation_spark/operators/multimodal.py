"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, partition-preserving mapInPandas, batch
shapes, numpy-vectorized byte handling) is real and tested; the actual
codec decode is STUBBED (this environment has no image/audio libraries):

- ``decode_image_meta``: parses a deterministic fake header (our synthetic
  payloads carry width/height/channels as big-endian uint16/8 in the first
  5 bytes) — swap ``_parse_header`` for a real codec (PIL/libvips) in prod.
- ``byte_histogram_features``: REAL feature extraction — 16-bin byte
  histogram per payload, vectorized with numpy.frombuffer/bincount.
- ``frame_sample``: raises NotImplementedError — marked stub for video
  codecs; the surrounding plumbing (explode of sampled frame indices,
  schema) is in place.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("source", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def make_fake_image_payload(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic synthetic 'image': 5-byte header + seeded body."""
    header = (
        int(width).to_bytes(2, "big")
        + int(height).to_bytes(2, "big")
        + int(channels).to_bytes(1, "big")
    )
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=min(width * height, 256), dtype=np.uint8)
    return header + body.tobytes()


def _parse_header(payload: bytes):
    # STUB decode: replace with a real image codec in production.
    if payload is None or len(payload) < 5:
        return (None, None, None)
    return (
        int.from_bytes(payload[0:2], "big"),
        int.from_bytes(payload[2:4], "big"),
        payload[4],
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """(media_id, width, height, channels, n_bytes) via mapInPandas —
    Arrow batches in, Arrow batches out; no shuffle, partition-preserving."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            parsed = [_parse_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "channels": [p[2] for p in parsed],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                }
            )

    return df.mapInPandas(go, schema=IMAGE_META_SCHEMA)


def byte_histogram_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Real (non-stub) feature extraction: normalized byte histogram per
    payload. numpy-vectorized inside the Arrow batch; this is the template
    for embedding-model feature UDFs at scale."""
    schema = FEATURE_SCHEMA

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // bins
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    feats.append([0.0] * bins)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins).astype(float)
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(go, schema=schema)


def resize_images(df: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor downsample by ``factor`` on the synthetic payload
    format: header dims divide by ``factor``; the pixel-byte stream keeps
    every ``factor``-th byte (numpy slice — vectorized, no copies beyond
    the output). REAL plumbing (Arrow batches, binary out, header rewrite);
    swap the body transform for a real resampler (PIL/libvips) in prod.
    Returns (media_id, payload) with the resized payload."""
    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                w, h, c = _parse_header(p)
                if w is None:
                    out.append(None)
                    continue
                body = np.frombuffer(p[5:], dtype=np.uint8)
                nw, nh = w // factor, h // factor
                header = (
                    int(nw).to_bytes(2, "big")
                    + int(nh).to_bytes(2, "big")
                    + int(c).to_bytes(1, "big")
                )
                out.append(header + body[::factor].tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return df.mapInPandas(go, schema=schema)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — NOT IMPLEMENTED (no codec in this
    environment). The call shape and output schema are fixed so a real
    decoder slots in behind this signature."""
    raise NotImplementedError(
        "frame_sample requires a video codec (e.g. pyav/ffmpeg); "
        "plumbing is defined — swap in a decoder in production."
    )
