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


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: payload hash seeds a
    (height, width, 3) uint8 pixel grid. Replace with PIL in production."""
    if payload is None:
        return None
    seed = int.from_bytes(hashlib.sha256(bytes(payload)).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def resize_images(
    df: DataFrame,
    payload_col: str = "html",
    width: int = 8,
    height: int = 8,
    source_size: int = 32,
    decoder: Optional[Callable[[bytes, int, int], np.ndarray]] = None,
) -> DataFrame:
    """binary column → resized image payload + typed shape metadata.

    mapInPandas with a real output contract — ``(input columns, pixels:
    binary, out_width: int, out_height: int, channels: int)`` — and an
    area-average downsample in NumPy (integer block mean; the part a real
    pipeline would keep).  The DECODE step is the stub
    (:func:`fake_decode_image`); pass a real decoder to drop in PIL.
    """
    decoder = decoder or (lambda b, w, h: fake_decode_image(b, w, h))
    fields = list(df.schema.fields) + [
        T.StructField("pixels", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
    schema = T.StructType(fields)
    fy, fx = source_size // height, source_size // width

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = pdf.copy()
            pixels, ows, ohs, chs = [], [], [], []
            for b in pdf[payload_col]:
                img = decoder(b, source_size, source_size)
                if img is None:
                    pixels.append(None); ows.append(None); ohs.append(None); chs.append(None)
                    continue
                h, w, c = img.shape
                small = (
                    img[: fy * height, : fx * width]
                    .reshape(height, fy, width, fx, c)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                pixels.append(small.tobytes())
                ows.append(width); ohs.append(height); chs.append(c)
            out["pixels"] = pixels
            out["out_width"] = pd.array(ows, dtype="Int32")
            out["out_height"] = pd.array(ohs, dtype="Int32")
            out["channels"] = pd.array(chs, dtype="Int32")
            yield out

    return df.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "html",
    num_frames: int = 4,
    id_cols: Optional[Iterable[str]] = None,
    decoder: Optional[Callable[[bytes, int], np.ndarray]] = None,
) -> DataFrame:
    """"Video" binary column → one output row PER SAMPLED FRAME.

    Exercises the 1→N mapInPandas row shape a real frame sampler needs:
    output = (id columns, frame_idx: int, frame: binary).  The frame
    decode is stubbed deterministically (hash of payload + index); a real
    ffmpeg-backed decoder drops into the same signature.
    """
    id_cols = list(id_cols) if id_cols else [df.columns[0]]

    def fake_frame(payload: bytes, idx: int) -> bytes:
        seed = hashlib.sha256(bytes(payload) + idx.to_bytes(4, "little")).digest()
        return seed[:16]

    decoder = decoder or fake_frame
    fields = [f for f in df.schema.fields if f.name in id_cols] + [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            idxs, frames = [], []
            # zip over raw columns, not iterrows (which builds a Series per
            # row and upcasts int64 ids to float64)
            id_values = zip(*(pdf[c] for c in id_cols))
            for row_ids, payload in zip(id_values, pdf[payload_col]):
                if payload is None:
                    continue
                for i in range(num_frames):
                    for c, v in zip(id_cols, row_ids):
                        rows[c].append(v)
                    idxs.append(i)
                    frames.append(decoder(payload, i))
            out = pd.DataFrame(rows)
            out["frame_idx"] = pd.array(idxs, dtype="Int32")
            out["frame"] = frames
            yield out

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# REAL paths for header-free raw payloads (no codec library required)
# ---------------------------------------------------------------------------


def resize_raw_images(
    df: DataFrame,
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    out_width: int = 8,
    out_height: int = 8,
) -> DataFrame:
    """REAL image path for raw (header-free) bitmaps: ``binary`` payload +
    typed shape metadata columns → area-average downsampled pixels.

    ``np.frombuffer(payload).reshape(h, w, c)`` IS the decoder for raw
    uint8 bitmaps — no PIL needed — so unlike :func:`resize_images`
    (stubbed decode for compressed formats) every byte of this path is
    real and value-testable.  Rows whose dimensions don't divide into the
    output grid use truncating block means (same policy as
    ``resize_images``); malformed rows (length ≠ h·w·c) yield nulls
    instead of failing the task.
    """
    fields = list(df.schema.fields) + [
        T.StructField("pixels", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = pdf.copy()
            pixels = []
            for payload, w, h, c in zip(
                pdf[payload_col], pdf[width_col], pdf[height_col], pdf[channels_col]
            ):
                if (
                    payload is None or pd.isna(w) or pd.isna(h) or pd.isna(c)
                    or len(payload) != int(w) * int(h) * int(c)
                ):
                    pixels.append(None)
                    continue
                img = np.frombuffer(payload, dtype=np.uint8).reshape(int(h), int(w), int(c))
                fy, fx = max(1, int(h) // out_height), max(1, int(w) // out_width)
                small = (
                    img[: fy * out_height, : fx * out_width]
                    .reshape(out_height, fy, out_width, fx, int(c))
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                pixels.append(small.tobytes())
            out["pixels"] = pixels
            out["out_width"] = pd.array(
                [None if p is None else out_width for p in pixels], dtype="Int32"
            )
            out["out_height"] = pd.array(
                [None if p is None else out_height for p in pixels], dtype="Int32"
            )
            yield out

    return df.mapInPandas(run, schema)


def pcm_band_energies(
    df: DataFrame,
    payload_col: str = "payload",
    n_bands: int = 8,
    output_col: str = "band_energies",
    batch_limit: int = 256,
) -> DataFrame:
    """REAL audio featurization: int16 little-endian PCM payload →
    log-scaled spectral band energies (``array<double>``, length
    *n_bands*).

    The "decode" for raw PCM is ``np.frombuffer(int16)`` and the feature
    is an rFFT magnitude spectrum split into *n_bands* equal bands — all
    NumPy, no audio library, fully value-testable (a pure tone must land
    its energy in the band containing its frequency).  Odd-length or
    empty payloads yield null features.  ``batch_limit`` bounds peak
    memory at ``batch_limit × payload`` bytes per task.
    """
    fields = list(df.schema.fields) + [
        T.StructField(output_col, T.ArrayType(T.DoubleType()))
    ]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo : lo + batch_limit].copy()
                feats = []
                for payload in chunk[payload_col]:
                    if payload is None or len(payload) < 2 or len(payload) % 2:
                        feats.append(None)
                        continue
                    samples = np.frombuffer(payload, dtype="<i2").astype("float64")
                    mag = np.abs(np.fft.rfft(samples))
                    # drop DC, split the spectrum into n_bands equal slices
                    mag = mag[1:]
                    usable = (len(mag) // n_bands) * n_bands
                    if usable == 0:
                        feats.append(None)
                        continue
                    bands = mag[:usable].reshape(n_bands, -1)
                    energy = (bands**2).sum(axis=1)
                    feats.append(np.log1p(energy).tolist())
                chunk[output_col] = feats
                yield chunk

    return df.mapInPandas(run, schema)
