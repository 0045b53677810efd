"""Opaque-binary multimodal columns over mapInPandas.

Design: media (image/audio/video) travels as a `binary` column plus typed
metadata (media_type, n_bytes, digest). Decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages — each batch is a
pandas DataFrame whose `payload` column holds raw bytes; the UDF never sees
one row at a time.

The actual media decoders are STUBBED: `decode_image` raises
NotImplementedError (no PIL/ffmpeg in this container), and
`extract_fake_features` substitutes a deterministic digest-derived feature
vector so the full pipeline — schema, batching, partitioning — is testable
end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

BINARY_TABLE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, digest string, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, feature array<double>, decode_status string"
)


def to_binary_table(documents: DataFrame) -> DataFrame:
    """Wrap a text corpus as a multimodal binary table (payload = utf-8
    bytes standing in for media blobs)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        payload.alias("payload"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode — STUB. Wire PIL/torchvision here in a container
    that ships them; the surrounding Spark plumbing is already correct."""
    raise NotImplementedError(
        "media decoding libraries are not available in this container; "
        "use extract_fake_features for the deterministic test path"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: first FEATURE_DIM bytes of sha256,
    scaled to [0,1]. Stable across runs/engines."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_fake_features(binary_table: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each partition streams in as pandas batches; the feature fn
    is applied vectorized per batch. At scale this is the exact shape a real
    decoder uses — only `_fake_feature` changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": pdf["payload"].map(_fake_feature),
                    "decode_status": "ok_fake",
                }
            )
            yield out

    return binary_table.mapInPandas(run, schema=FEATURE_SCHEMA)
