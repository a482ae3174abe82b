"""Multimodal binary-column plumbing (images / audio / video).

Treats media as opaque ``binary`` columns with typed metadata, exactly
as a 100 TB training-data pipeline does.  The Spark-side plumbing —
schemas, batch shapes, ``mapInPandas`` signatures, partitioning — is
real and tested; the codec step itself is STUBBED (this container has
no image/audio libraries): ``decode_image`` either raises
``NotImplementedError`` (``strict=True``) or produces a deterministic
fake decode derived from the bytes, so downstream feature/resize/
frame-sample operators exercise real array plumbing.

This is also where the reference's Mapillary/Mask2Former stage
(visibility.py:738-744, 876-1005) plugs in: ``segment_green_fraction``
is the vegetation-ratio hook (label 8 ratio at visibility.py:899-903);
its stub produces the deterministic stand-in the streetview GVI
aggregation (operators/visibility.py) consumes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, channels int"
)


def attach_binary_metadata(df: DataFrame, bin_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Typed metadata for an opaque binary column — JVM-side only
    (octet_length / sha2 / substring are codegen)."""
    return df.select(
        id_col,
        F.col(bin_col),
        F.octet_length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic fake decode: bytes → (h, w, 3) uint8 image whose
    dims/content derive from a digest of the bytes.  Stands in for a
    real JPEG/PNG decoder; REPLACE with PIL/libvips on a cluster image.
    """
    d = hashlib.sha256(buf).digest()
    h = 16 + d[0] % 48
    w = 16 + d[1] % 48
    seed = np.frombuffer(d, dtype=np.uint8).astype(np.uint32)
    n = h * w * 3
    stream = np.resize(np.cumsum(seed * 2654435761 % 255).astype(np.uint8), n)
    return stream.reshape(h, w, 3)


def decode_images(
    df: DataFrame, bin_col: str = "media", id_col: str = "media_id", strict: bool = False
) -> DataFrame:
    """[id, width, height, channels, pixels array<int>] — decode via
    mapInPandas (Arrow batches of binary in, array column out).

    strict=True raises NotImplementedError per batch — the marker that
    a real codec must be installed on the cluster image.
    """

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/libvips); "
                    "not available in this environment"
                )
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[bin_col]):
                arr = _fake_decode(bytes(buf))
                # uint8 bytes, not array<int>: 1 B/px vs ~12 B/px boxed
                # through Arrow — the payload a real pipeline ships
                rows.append(
                    (int(mid), arr.shape[1], arr.shape[0], 3, arr.ravel().tobytes())
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "pixels"]
            )

    return df.select(id_col, bin_col).mapInPandas(
        run, schema=f"{id_col} long, width int, height int, channels int, pixels binary"
    )


def resize_images(decoded: DataFrame, out_w: int = 16, out_h: int = 16,
                  id_col: str = "media_id") -> DataFrame:
    """Nearest-neighbour resize over the decoded array column —
    vectorized NumPy per Arrow batch (real resample math; kernel-swap
    for area/bilinear is local to this function)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(r.height, r.width, r.channels)
                yi = (np.arange(out_h) * r.height // out_h)
                xi = (np.arange(out_w) * r.width // out_w)
                small = arr[yi[:, None], xi[None, :], :]
                rows.append((getattr(r, id_col), out_w, out_h, r.channels,
                             small.ravel().tobytes()))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "channels", "pixels"])

    return decoded.mapInPandas(
        run, schema=f"{id_col} long, width int, height int, channels int, pixels binary"
    )


def image_features(decoded: DataFrame, id_col: str = "media_id") -> DataFrame:
    """[id, mean_r, mean_g, mean_b, brightness] — per-channel stats
    (the feature-extraction hook; deterministic on the fake decode)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.uint8).astype(np.float64).reshape(-1, 3)
                m = arr.mean(axis=0)
                rows.append((getattr(r, id_col), round(m[0], 3), round(m[1], 3),
                             round(m[2], 3), round(float(arr.mean()), 3)))
            yield pd.DataFrame(rows, columns=[id_col, "mean_r", "mean_g", "mean_b", "brightness"])

    return decoded.mapInPandas(
        run, schema=f"{id_col} long, mean_r double, mean_g double, mean_b double, brightness double"
    )


def frame_sample(
    df: DataFrame, n_frames_col: str = "n_frames", every: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, every, 2·every…
    < n_frames — pure codegen (sequence/explode), the real decoder runs
    downstream per sampled frame."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def segment_green_fraction(
    decoded: DataFrame, id_col: str = "media_id", strict: bool = False
) -> DataFrame:
    """[id, GVI] — vegetation-fraction hook (Mask2Former label-8 ratio,
    visibility.py:899-903).  Stub: fraction of pixels whose G channel
    dominates (deterministic stand-in with the same output contract)."""

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "semantic segmentation requires a model runtime; "
                    "not available in this environment"
                )
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(-1, 3)
                green = (arr[:, 1] > arr[:, 0]) & (arr[:, 1] > arr[:, 2])
                rows.append((getattr(r, id_col), round(float(green.mean()), 3)))
            yield pd.DataFrame(rows, columns=[id_col, "GVI"])

    return decoded.mapInPandas(run, schema=f"{id_col} long, GVI double")


def _fake_decode_audio(buf: bytes, sr: int = 16000) -> np.ndarray:
    """Deterministic fake PCM decode: bytes → float32 mono waveform in
    [-1, 1], length derived from a digest.  Stands in for a real
    libsndfile/ffmpeg decoder; REPLACE on a cluster image."""
    d = hashlib.sha256(buf).digest()
    n = sr // 100 * (1 + d[0] % 20)  # 10..200 ms of samples
    seed = np.frombuffer(d, dtype=np.uint8).astype(np.int64)
    stream = np.resize(np.cumsum(seed * 2654435761 % 65521), n)
    return ((stream % 65521).astype(np.float32) / 32760.5) - 1.0


def decode_audio(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "media_id",
    sample_rate: int = 16000,
    strict: bool = False,
) -> DataFrame:
    """[id, sample_rate, n_samples, pcm binary] — audio decode over
    mapInPandas (Arrow batches; float32 PCM shipped as binary, the same
    1-copy payload convention as decoded image pixels).

    strict=True raises NotImplementedError per batch — the marker that
    a real audio codec must be installed on the cluster image.
    """

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires a codec library (soundfile/ffmpeg); "
                    "not available in this environment"
                )
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[bin_col]):
                wav = _fake_decode_audio(bytes(buf), sample_rate)
                rows.append((int(mid), sample_rate, len(wav), wav.tobytes()))
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "n_samples", "pcm"]
            )

    return df.select(id_col, bin_col).mapInPandas(
        run, schema=f"{id_col} long, sample_rate int, n_samples int, pcm binary"
    )


def audio_features(decoded: DataFrame, id_col: str = "media_id") -> DataFrame:
    """[id, duration_s, rms, peak, zero_crossings] — per-clip features
    (vectorized NumPy per Arrow batch; the audio analogue of
    image_features)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wav = np.frombuffer(r.pcm, dtype=np.float32).astype(np.float64)
                zc = int(np.count_nonzero(np.diff(np.signbit(wav))))
                rows.append(
                    (
                        getattr(r, id_col),
                        round(r.n_samples / r.sample_rate, 6),
                        round(float(np.sqrt(np.mean(wav * wav))), 6),
                        round(float(np.abs(wav).max()), 6),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "duration_s", "rms", "peak", "zero_crossings"],
            )

    return decoded.mapInPandas(
        run,
        schema=(
            f"{id_col} long, duration_s double, rms double, "
            "peak double, zero_crossings long"
        ),
    )
