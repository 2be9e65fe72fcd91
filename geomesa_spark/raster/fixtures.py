"""Deterministic image+caption fixture per BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

Generation is pure-function-of-index (seed 42, no wall clock, no external
data), so any executor can regenerate any row — this is what makes the
per-row pixel/caption invariant checkable and the ingest job resumable.

Geo columns are derived from ``phash`` bits as documented in FIXTURES.md §1;
10% of rows are pulled into 5 Gaussian "city" clusters (sigma = 0.5 deg) to
create hot tiles for the skew tests (reference analog: shard-spreading of
hot ranges, /root/reference/geomesa-index-api/src/main/scala/org/locationtech/geomesa/index/api/ShardStrategy.scala:42-80).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from geomesa_spark.raster.codec import encode_image

SEED = 42
# (lon, lat) of the 5 hot clusters: SF, Paris, Tokyo, Sydney, Rio
CITIES = ((-122.4, 37.8), (2.35, 48.85), (139.7, 35.7),
          (151.2, -33.9), (-43.2, -22.9))
FMT_CYCLE = ("rawz", "q5")  # lossless / lossy stand-ins (no PIL in container)

IMAGE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long, lon double, lat double")


def _phash(image_id: str) -> int:
    return int.from_bytes(hashlib.sha256(image_id.encode()).digest()[:8],
                          "big", signed=True)


def _lonlat(i: int, phash: int) -> tuple[float, float]:
    u = phash & 0xFFFFFFFFFFFFFFFF
    lon = -180.0 + 360.0 * ((u >> 20) & 0xFFFFF) / float(1 << 20)
    lat = -90.0 + 180.0 * (u & 0xFFFFF) / float(1 << 20)
    if i % 10 == 0:  # hot-tile rows
        cx, cy = CITIES[(i // 10) % len(CITIES)]
        rng = np.random.default_rng(SEED + 7 * i)
        lon = float(np.clip(cx + rng.normal(0.0, 0.5), -180.0, 180.0))
        lat = float(np.clip(cy + rng.normal(0.0, 0.5), -90.0, 90.0))
    return lon, lat


def reference_pixels(i: int) -> np.ndarray:
    """Ground-truth pixels for row i: RGB gradient + per-image PRNG noise."""
    w = 16 + (i % 4) * 16
    h = 16 + ((i // 4) % 4) * 16
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack([
        (xx * 255) // max(w - 1, 1),
        (yy * 255) // max(h - 1, 1),
        ((xx + yy) * 255) // max(w + h - 2, 1),
    ], axis=-1).astype(np.int16)
    noise = np.random.default_rng(SEED + i).integers(-16, 17, size=(h, w, 3),
                                                     dtype=np.int16)
    return np.clip(grad + noise, 0, 255).astype(np.uint8)


def image_row(i: int) -> dict:
    image_id = f"img-{i:012d}"
    phash = _phash(image_id)
    lon, lat = _lonlat(i, phash)
    px = reference_pixels(i)
    h, w, _ = px.shape
    fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
    return {
        "image_id": image_id,
        "bytes": encode_image(px, fmt),
        "w": w, "h": h, "fmt": fmt,
        "caption": f"caption {i}: synthetic image at ({lon:.6f},{lat:.6f})",
        "phash": phash,
        "lon": lon, "lat": lat,
    }


def image_batch(lo: int, hi: int) -> pd.DataFrame:
    """Rows [lo, hi) as a pandas frame — the unit of Arrow-batched work."""
    return pd.DataFrame([image_row(i) for i in range(lo, hi)])


def images_df(spark, n: int, *, partitions: int | None = None):
    """Distributed fixture build: ``spark.range(n)`` -> ``mapInPandas``.

    Each executor synthesizes only its own index range (no driver-side
    materialization, no shuffle), so this scales to any n — the same
    pattern a real ingest would use to read image files per-partition.
    """
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield pd.DataFrame([image_row(int(i)) for i in ids])

    return (spark.range(0, n, numPartitions=parts)
            .mapInPandas(gen, schema=IMAGE_SCHEMA))
