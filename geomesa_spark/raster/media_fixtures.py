"""Deterministic video/audio fixtures whose decoded samples a SQL engine
can regenerate bit-exactly — the same counter-mode sha256 construction as
the image fixture's pixel noise (`fixtures.py:_pixel_noise`, proven
oracle-exact by `image_brightness`): sample k of media row i reads 16-bit
big-endian word k%16 of sha256(f"{prefix}-{i}-{k//16}"), so the DuckDB
twin re-derives every PCM value / pixel with sha256 + substr and the
per-clip reductions (RMS, zero-cross rate, frame mean) divide exact
integer sums once — bit-identical IEEE on both engines.

Metadata shapes follow the multimodal brief: opaque ``bytes`` binary +
typed columns (n_frames/w/h/fmt, sample_rate), built distributed via
``spark.range -> mapInPandas`` (each executor synthesizes its own index
range; no driver materialization — the pattern a real ingest over media
files would use)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from geomesa_spark.raster.media import encode_audio, encode_video

AUDIO_SCHEMA = ("media_id string, bytes binary, fmt string, "
                "sample_rate int, n_samples int")
VIDEO_SCHEMA = ("media_id string, bytes binary, n_frames int, w int, "
                "h int, fmt string")

AUDIO_RATE = 8000


def _hash_words(prefix: str, i: int, n: int) -> np.ndarray:
    """n 16-bit big-endian words of counter-mode sha256 over
    f"{prefix}-{i}-{block}" — integer ops only, SQL-regenerable."""
    nblocks = (n + 15) // 16
    buf = b"".join(
        hashlib.sha256(f"{prefix}-{i}-{b}".encode()).digest()
        for b in range(nblocks))
    return np.frombuffer(buf, dtype=">u2")[:n]


def audio_samples(i: int) -> int:
    return 800 + (i % 5) * 400


def reference_pcm(i: int) -> np.ndarray:
    """Ground-truth int16 PCM for clip i: word % 4001 - 2000."""
    words = _hash_words("au", i, audio_samples(i))
    return ((words % 4001).astype(np.int32) - 2000).astype(np.int16)


def audio_row(i: int) -> dict:
    return {
        "media_id": f"au-{i:012d}",
        "bytes": encode_audio(reference_pcm(i)),
        "fmt": "rawa",
        "sample_rate": AUDIO_RATE,
        "n_samples": audio_samples(i),
    }


def video_frames(i: int) -> tuple[int, int, int]:
    """(n_frames, w, h) for clip i."""
    return 4 + i % 3, 8 + (i % 2) * 8, 8


def reference_video(i: int) -> np.ndarray:
    """Ground-truth (n, h, w, 3) uint8 frames: word % 256 in row-major
    (frame, y, x, channel) order — sample k belongs to frame
    k // (h*w*3)."""
    n, w, h = video_frames(i)
    words = _hash_words("vx", i, n * h * w * 3)
    return (words % 256).astype(np.uint8).reshape(n, h, w, 3)


def video_row(i: int) -> dict:
    n, w, h = video_frames(i)
    return {
        "media_id": f"vid-{i:012d}",
        "bytes": encode_video(reference_video(i)),
        "n_frames": n, "w": w, "h": h,
        "fmt": "rawv",
    }


def _media_df(spark, n: int, row_fn, schema: str,
              partitions: int | None = None):
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([row_fn(int(i)) for i in ids])

    return (spark.range(0, n, numPartitions=parts)
            .mapInPandas(gen, schema=schema))


def audio_df(spark, n: int, *, partitions: int | None = None):
    return _media_df(spark, n, audio_row, AUDIO_SCHEMA,
                     partitions=partitions)


def videos_df(spark, n: int, *, partitions: int | None = None):
    return _media_df(spark, n, video_row, VIDEO_SCHEMA,
                     partitions=partitions)
