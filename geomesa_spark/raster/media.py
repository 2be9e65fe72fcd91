"""Multimodal media columns beyond still images: video frame-sampling and
audio feature extraction.

Per the task brief, media payloads are opaque ``binary`` columns with
typed metadata; decode / frame-sample / feature-extract run as
Arrow-batched pandas UDFs over ``mapInPandas``. The container has no
av/ffmpeg/soundfile libraries, so REAL codecs (mp4/mkv/wav/mp3) are
stubbed behind an import-try raising NotImplementedError, while the
Spark-side plumbing — schema, batch shape, UDF signatures, partitioning —
is exercised with deterministic numpy-native formats:

- ``rawv``: synthetic video = n_frames concatenated raw RGB frames
  (shape from the row's w/h metadata), zlib-compressed.
- ``rawa``: synthetic audio = int16 PCM mono, zlib-compressed, with a
  sample-rate metadata column.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:
    import av  # noqa: F401
    _HAVE_AV = True
except ImportError:
    _HAVE_AV = False


# ------------------------------------------------------------- codecs

def encode_video(frames: np.ndarray, fmt: str = "rawv") -> bytes:
    """frames: (n, h, w, 3) uint8."""
    if fmt != "rawv":
        raise NotImplementedError(
            f"video format {fmt!r} needs an av library not present here")
    if frames.dtype != np.uint8 or frames.ndim != 4:
        raise ValueError("expected (n, h, w, 3) uint8")
    return zlib.compress(frames.tobytes(), 6)


def decode_video(data: bytes, n_frames: int, w: int, h: int,
                 fmt: str = "rawv") -> np.ndarray:
    if fmt != "rawv":
        raise NotImplementedError(
            f"video format {fmt!r} needs an av library not present here")
    return np.frombuffer(zlib.decompress(data), dtype=np.uint8) \
        .reshape(n_frames, h, w, 3)


def encode_audio(pcm: np.ndarray, fmt: str = "rawa") -> bytes:
    """pcm: (n_samples,) int16 mono."""
    if fmt != "rawa":
        raise NotImplementedError(
            f"audio format {fmt!r} needs an audio library not present here")
    return zlib.compress(np.asarray(pcm, dtype=np.int16).tobytes(), 6)


def decode_audio(data: bytes, fmt: str = "rawa") -> np.ndarray:
    if fmt != "rawa":
        raise NotImplementedError(
            f"audio format {fmt!r} needs an audio library not present here")
    return np.frombuffer(zlib.decompress(data), dtype=np.int16)


# ----------------------------------------------------------- operators

def sample_frames(videos: DataFrame, *, every: int = 2,
                  thumb_px: int | None = None) -> DataFrame:
    """Explode each video row into every ``every``-th frame
    (media_id, frame_idx, w, h, frame binary raw RGB), optionally
    mean-pooled to thumb_px — the frame-sampling stage of a video
    training-data pipeline. One mapInPandas pass, no shuffle."""
    from geomesa_spark.raster.codec import mean_pool

    out_schema = "media_id string, frame_idx int, w int, h int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(r.bytes, r.n_frames, r.w, r.h, r.fmt)
                for idx in range(0, r.n_frames, every):
                    f = frames[idx]
                    if thumb_px:
                        f = mean_pool(f, thumb_px, thumb_px)
                    rows.append((r.media_id, idx, f.shape[1], f.shape[0],
                                 f.tobytes()))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                                  "w", "h", "frame"])

    cols = ["media_id", "bytes", "n_frames", "w", "h", "fmt"]
    return videos.select(*cols).mapInPandas(sample, out_schema)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame statistics over sampled raw-RGB frames (the inspection
    stage after `sample_frames`): mean value over all bytes — the exact
    integer pixel sum divided once, so a SQL oracle that regenerates the
    pixels reproduces the double bit-exactly. One mapInPandas pass,
    no shuffle."""
    out_schema = "media_id string, frame_idx int, mean_value double"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(bytes(r.frame), dtype=np.uint8)
                rows.append((r.media_id, r.frame_idx,
                             int(px.sum()) / len(px) if len(px) else 0.0))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                                  "mean_value"])

    return frames.select("media_id", "frame_idx", "frame") \
        .mapInPandas(stats, out_schema)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip PCM features: duration, RMS level, peak, zero-crossing
    rate — the audio feature-extract stage (numpy per clip, Arrow
    batched)."""
    out_schema = ("media_id string, duration_s double, rms double, "
                  "peak int, zero_cross_rate double")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = decode_audio(r.bytes, r.fmt).astype(np.float64)
                n = len(pcm)
                zc = float(np.mean(np.signbit(pcm[1:]) !=
                                   np.signbit(pcm[:-1]))) if n > 1 else 0.0
                rows.append((r.media_id, n / float(r.sample_rate),
                             float(np.sqrt(np.mean(pcm ** 2))) if n else 0.0,
                             int(np.abs(pcm).max()) if n else 0, zc))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "media_id", "duration_s", "rms", "peak",
                    "zero_cross_rate"])

    cols = ["media_id", "bytes", "fmt", "sample_rate"]
    return audio.select(*cols).mapInPandas(feats, out_schema)
