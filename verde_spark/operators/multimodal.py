"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns; decode/feature steps
run as Arrow-batched ``mapInPandas``.

Fully REAL paths (no codec library needed, value-tested end to end):

* raw uint8 bitmaps — :func:`resize_raw_images`;
* int16 PCM — :func:`pcm_band_energies`;
* **PNG** — :func:`decode_png` (stdlib ``zlib`` inflate + NumPy scanline
  unfilter: None/Sub/Up/Average/Paeth) feeding :func:`resize_png_images`;
* **WAV** — :func:`decode_wav` (RIFF/fmt/data parse over the PCM path)
  feeding :func:`wav_band_energies`.

Codecs that genuinely need third-party libraries (JPEG entropy coding,
ffmpeg video demux) remain STUBBED behind deterministic fakes so the
Spark-side contract (schema, batching, 1→N row shapes) is still real and
tested; passing a real decoder callable (PIL/ffmpeg/…) drops straight in.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
                    # smaller than the output grid: the block-mean
                    # reshape below would raise and fail the whole task;
                    # the contract is nulls, not failures (same guard as
                    # resize_png_images)
                    or int(h) < out_height or int(w) < out_width
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
                    feats.append(_fft_band_energies(samples, n_bands))
                chunk[output_col] = feats
                yield chunk

    return df.mapInPandas(run, schema)


def _fft_band_energies(samples: np.ndarray, n_bands: int):
    """rFFT magnitude spectrum → log1p energy of *n_bands* equal slices
    (DC dropped); None when too short. Shared by the raw-PCM and WAV paths
    so their features are bit-identical on the same samples."""
    mag = np.abs(np.fft.rfft(samples))[1:]
    usable = (len(mag) // n_bands) * n_bands
    if usable == 0:
        return None
    energy = (mag[:usable].reshape(n_bands, -1) ** 2).sum(axis=1)
    return np.log1p(energy).tolist()


# ---------------------------------------------------------------------------
# REAL compressed-codec paths: PNG (stdlib zlib) and WAV (RIFF header)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (palette expands to RGB after unfilter)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> Optional[np.ndarray]:
    """REAL PNG decoder — stdlib ``zlib`` inflate + NumPy scanline
    unfiltering; no image library.

    Supports the common web-PNG shapes: bit depth 8, color types 0
    (gray) / 2 (RGB) / 3 (palette, expanded to RGB) / 4 (gray+alpha) /
    6 (RGBA), non-interlaced, any number of IDAT chunks. All five
    scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) are
    reconstructed: None/Up/Sub vectorize (Sub is a per-channel cumsum
    mod 256); Average/Paeth carry a left-pixel dependency and walk the
    scanline. Returns a ``(height, width, channels)`` uint8 array, or
    ``None`` for anything malformed / unsupported (16-bit, Adam7) — the
    mapInPandas callers turn that into null rows, never task failures.
    """
    if payload is None:
        return None
    data = bytes(payload)
    if not data.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    palette = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            return None
        pos += 12 + length  # 4 len + 4 type + body + 4 crc (crc not checked)
        if ctype == b"IHDR":
            if length != 13:
                return None
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body[: (length // 3) * 3], np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    nch = _PNG_CHANNELS.get(color_type) if color_type is not None else None
    if (
        not idat or not width or not height or bit_depth != 8 or interlace != 0
        or nch is None or (color_type == 3 and palette is None)
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        return None
    raw = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), np.int64)
    zero_row = np.zeros(stride, np.int64)
    for y in range(height):
        f = int(filters[y])
        cur = rows[y].astype(np.int64)
        prev = out[y - 1] if y else zero_row
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            rec = np.cumsum(cur.reshape(width, nch), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average
            rec = cur
            for x in range(stride):
                left = rec[x - nch] if x >= nch else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) % 256
        else:
            return None
        out[y] = rec
    img = out.astype(np.uint8).reshape(height, width, nch)
    if color_type == 3:
        idx = img[:, :, 0]
        if idx.max() >= len(palette):
            return None
        img = palette[idx]
    return img


def resize_png_images(
    df: DataFrame,
    payload_col: str = "payload",
    out_width: int = 8,
    out_height: int = 8,
) -> DataFrame:
    """REAL compressed-image path: PNG ``binary`` column → area-average
    downsampled pixels + typed shape metadata, end to end with no image
    library (:func:`decode_png` + the same truncating block mean as
    :func:`resize_raw_images`).

    Output columns: input columns + ``(pixels: binary, out_width,
    out_height, channels: int)``; undecodable rows yield nulls. Replaces
    the former "compressed codecs are stubbed" caveat for PNG.
    """
    fields = list(df.schema.fields) + [
        T.StructField("pixels", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = pdf.copy()
            pixels, chs = [], []
            for payload in pdf[payload_col]:
                img = decode_png(payload)
                if img is None or img.shape[0] < out_height or img.shape[1] < out_width:
                    pixels.append(None)
                    chs.append(None)
                    continue
                h, w, c = img.shape
                fy, fx = h // out_height, w // out_width
                small = (
                    img[: fy * out_height, : fx * out_width]
                    .reshape(out_height, fy, out_width, fx, c)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                pixels.append(small.tobytes())
                chs.append(c)
            out["pixels"] = pixels
            out["out_width"] = pd.array(
                [None if p is None else out_width for p in pixels], dtype="Int32"
            )
            out["out_height"] = pd.array(
                [None if p is None else out_height for p in pixels], dtype="Int32"
            )
            out["channels"] = pd.array(chs, dtype="Int32")
            yield out

    return df.mapInPandas(run, schema)


def decode_wav(payload: bytes):
    """REAL WAV decoder — RIFF/``fmt ``/``data`` chunk walk over the raw
    int16-PCM path; no audio library.

    Returns ``(sample_rate, n_channels, samples)`` with ``samples`` shaped
    ``(frames, n_channels)`` int16, or ``None`` for malformed headers /
    non-PCM (format tag ≠ 1) / non-16-bit payloads. Chunks are walked with
    RIFF word alignment, so extra chunks (LIST, fact, …) are skipped.
    """
    if payload is None:
        return None
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are 2-byte aligned
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        return None
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16 or n_channels < 1:
        return None
    frame_bytes = 2 * n_channels
    usable = len(pcm) - (len(pcm) % frame_bytes)
    if usable == 0:
        return None
    samples = np.frombuffer(pcm[:usable], "<i2").reshape(-1, n_channels)
    return sample_rate, n_channels, samples


def wav_band_energies(
    df: DataFrame,
    payload_col: str = "payload",
    n_bands: int = 8,
    output_col: str = "band_energies",
    batch_limit: int = 256,
) -> DataFrame:
    """REAL compressed-audio path: WAV ``binary`` column → log-scaled
    spectral band energies + typed audio metadata, end to end with no
    audio library (:func:`decode_wav` + the same rFFT band core as
    :func:`pcm_band_energies` — a mono WAV wrapping the same samples
    yields bit-identical features).

    Multi-channel audio is mixed to mono (mean of channels) before the
    FFT. Output columns: input columns + ``(band_energies:
    array<double>, sample_rate: int, n_channels: int)``; undecodable
    rows yield nulls. ``batch_limit`` bounds peak memory per task.
    """
    fields = list(df.schema.fields) + [
        T.StructField(output_col, T.ArrayType(T.DoubleType())),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo : lo + batch_limit].copy()
                feats, rates, chans = [], [], []
                for payload in chunk[payload_col]:
                    decoded = decode_wav(payload)
                    if decoded is None:
                        feats.append(None)
                        rates.append(None)
                        chans.append(None)
                        continue
                    rate, nch, samples = decoded
                    mono = samples.astype("float64").mean(axis=1)
                    feats.append(_fft_band_energies(mono, n_bands))
                    rates.append(rate)
                    chans.append(nch)
                chunk[output_col] = feats
                chunk["sample_rate"] = pd.array(rates, dtype="Int32")
                chunk["n_channels"] = pd.array(chans, dtype="Int32")
                yield chunk

    return df.mapInPandas(run, schema)
