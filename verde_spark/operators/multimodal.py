"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns; decode/feature steps
run as Arrow-batched ``mapInPandas`` so the Spark-side contract (schema,
batching, partition behavior) is real and tested even though the actual
codecs are STUBBED in this container (no image/audio libraries): the
default ``decoder`` is a deterministic fake that derives a feature vector
from the payload bytes; passing a real decoder callable (PIL/librosa/…)
drops straight in.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fake_decode(payload: bytes, feature_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a media decoder: sha256 of the payload →
    *feature_dim* floats in [0, 1). Replace with a real decoder in
    production — the Spark plumbing is identical."""
    if payload is None:
        return np.full(feature_dim, np.nan)
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer((digest * ((feature_dim * 4) // len(digest) + 1))[: feature_dim * 4], dtype="<u4")
    return raw.astype("float64") / float(1 << 32)


def real_decode_unavailable(payload: bytes):  # pragma: no cover - by design
    """Marker for the genuinely-unimplemented codec path."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not installed in this environment; "
        "pass a decoder callable to extract_features()"
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "html",
    output_col: str = "features",
    feature_dim: int = 8,
    decoder: Optional[Callable[[bytes], np.ndarray]] = None,
    batch_limit: int = 1024,
) -> DataFrame:
    """binary column → ``array<double>`` feature column via mapInPandas.

    The decoder runs per row *inside* a vectorized batch loop (media
    decoding is inherently per-payload); Arrow moves the bytes in bulk and
    ``batch_limit`` re-chunks oversized batches so peak memory is bounded
    by ``batch_limit × payload`` rather than the Arrow default batch size.
    """
    decoder = decoder or (lambda b: fake_decode(b, feature_dim))
    fields = list(df.schema.fields) + [T.StructField(output_col, T.ArrayType(T.DoubleType()))]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo : lo + batch_limit].copy()
                chunk[output_col] = [
                    decoder(b).tolist() if b is not None else None for b in chunk[payload_col]
                ]
                yield chunk

    return df.mapInPandas(run, schema)


def payload_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata for a binary column without decoding it: byte length,
    content hash, magic-byte sniff — all JVM-side expressions."""
    payload = F.col(payload_col)
    magic = F.substring(payload, 1, 8)
    kind = (
        F.when(F.startswith(payload, F.lit(b"\x89PNG")), "png")
        .when(F.startswith(payload, F.lit(b"\xff\xd8\xff")), "jpeg")
        .when(F.startswith(payload, F.lit(b"RIFF")), "riff")
        .when(F.startswith(payload, F.lit(b"<html")), "html")
        .otherwise("unknown")
    )
    return df.withColumn("payload_bytes", F.length(payload)).withColumn(
        "payload_hash", F.xxhash64(payload)
    ).withColumn("payload_kind", kind)
