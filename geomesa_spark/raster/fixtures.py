"""Deterministic image+caption fixture per BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

Generation is pure-function-of-index (seed 42, no wall clock, no external
data), so any executor can regenerate any row — this is what makes the
per-row pixel/caption invariant checkable and the ingest job resumable.

Geo columns are derived from ``phash`` bits as documented in FIXTURES.md §1;
10% of rows are pulled into 5 near-Gaussian "city" clusters (sigma = 0.5
deg, Irwin-Hall sum of 8 sha256-derived uniforms — pure IEEE +,-,*,/ so a
SQL engine replicates every coordinate bit-exactly) to create hot tiles for
the skew tests (reference analog: shard-spreading of hot ranges,
/root/reference/geomesa-index-api/src/main/scala/org/locationtech/geomesa/index/api/ShardStrategy.scala:42-80).
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


# sigma(0.5) / std(IrwinHall(8)) = 0.5 / sqrt(8/12); a hard-coded literal so
# the SQL oracle parses the exact same double (no libm sqrt on either side).
_IH_SCALE = 0.6123724356957945


def _hot_offsets(i: int) -> tuple[float, float]:
    """Near-Gaussian (sigma 0.5) lon/lat offsets for hot row i: sum of 8
    uniform 16-bit words from sha256(f"geo-{i}") per coordinate, centred
    and scaled. Every op is exact in float64 except the final scale/add,
    so DuckDB reproduces the coordinates bit-for-bit (the oracle for
    image_tile_counts depends on this)."""
    d = hashlib.sha256(f"geo-{i}".encode()).digest()
    w = [int.from_bytes(d[2 * j:2 * j + 2], "big") for j in range(16)]
    s_lon = sum(x / 65536.0 for x in w[:8])   # exact: dyadic rationals
    s_lat = sum(x / 65536.0 for x in w[8:])
    return ((s_lon - 4.0) * _IH_SCALE, (s_lat - 4.0) * _IH_SCALE)


def _lonlat(i: int, phash: int) -> tuple[float, float]:
    u = phash & 0xFFFFFFFFFFFFFFFF
    lon = -180.0 + 360.0 * ((u >> 20) & 0xFFFFF) / float(1 << 20)
    lat = -90.0 + 180.0 * (u & 0xFFFFF) / float(1 << 20)
    if i % 10 == 0:  # hot-tile rows
        cx, cy = CITIES[(i // 10) % len(CITIES)]
        dx, dy = _hot_offsets(i)
        lon = min(max(cx + dx, -180.0), 180.0)
        lat = min(max(cy + dy, -90.0), 90.0)
    return lon, lat


def _pixel_noise(i: int, n: int) -> np.ndarray:
    """Deterministic pixel noise for image i: value k reads 16-bit
    big-endian word k%16 of sha256(f"px-{i}-{k//16}"), mapped to
    [-16, 16] via ``% 33 - 16``. Pure counter-mode hashing — integer ops
    only — so a SQL engine regenerates every noise value exactly (the
    image_brightness oracle re-derives these with DuckDB's sha256 +
    substr; same construction as the Irwin–Hall city offsets above)."""
    nblocks = (n + 15) // 16
    buf = b"".join(hashlib.sha256(b"px-%d-%d" % (i, b)).digest()
                   for b in range(nblocks))
    words = np.frombuffer(buf, dtype=">u2")[:n]
    return (words % 33).astype(np.int16) - 16


def reference_pixels(i: int) -> np.ndarray:
    """Ground-truth pixels for row i: RGB gradient + per-image hash noise
    (row-major (y, x, channel) value order)."""
    w = 16 + (i % 4) * 16
    h = 16 + ((i // 4) % 4) * 16
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack([
        (xx * 255) // max(w - 1, 1),
        (yy * 255) // max(h - 1, 1),
        ((xx + yy) * 255) // max(w + h - 2, 1),
    ], axis=-1).astype(np.int16)
    noise = _pixel_noise(i, h * w * 3).reshape(h, w, 3)
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
