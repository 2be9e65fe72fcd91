"""Z2 space-filling curve, vectorized in numpy.

Semantics follow GeoMesa's Z2 index (cited for parity, no code copied):

- Normalization: lon/lat floor-binned into ``2^res`` bins with the upper
  bound clamped into the last bin — the behavior of
  ``NormalizedDimension.normalize`` (/root/reference/geomesa-z3/src/main/scala/
  org/locationtech/geomesa/curve/NormalizedDimension.scala:56-72).
- Cell id: Morton (bit-interleaved) code of the two bin indices —
  ``Z2SFC.index`` (/root/reference/geomesa-z3/.../curve/Z2SFC.scala:27-41).
- Partition prefix: the cell id truncated to a coarser resolution — the
  filesystem datastore's partition name, ``Z2Scheme.getPartitionName``
  (/root/reference/geomesa-fs/.../partitions/Z2Scheme.scala:31-35).
- Query covers: a bbox decomposes into the set of coarse cells it overlaps —
  ``SpatialScheme.getIntersectingPartitions`` (same file :43-59) /
  ``Z2SFC.ranges`` (Z2SFC.scala:48-53). Covers may over-select, never
  under-select; exact refinement happens downstream.

All kernels are ufunc-vectorized over int64/float64 numpy arrays: zero
per-row Python. Max usable resolution here is 31 bits/dim (62-bit codes in
a signed int64), matching the reference's 31-bit Z2.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 31  # bits per dimension, as in the reference Z2 curve

# Default PARTITION resolution: 2^4 x 2^4 = 256 world cells. Scale tuning:
# pick res so a typical cell holds ~1-16 GB (a few parquet row groups), and
# rely on (a) scan-side file splitting (maxPartitionBytes) so a hot cell
# never becomes one huge read task, and (b) write-side salting
# (write_images(salt=...) / ShardStrategy analog) so a hot cell never
# becomes one huge writer task. Rules of thumb at ~1 KB/row: <=10^8 rows ->
# res 4; 10^9-10^10 -> res 6-8 (4k-65k cells); 10^11-10^12 (the 100 TB
# shape) -> res 8-10 plus salting for urban cells, which keeps the hottest
# city cell under ~1% of the table. Queries prune with prefix ranges, so a
# finer res never changes results — only file/partition counts
# (bench_skew.py measures the hot-cell-vs-uniform penalty end-to-end).
PARTITION_RES = 4

_LON_MIN, _LON_MAX = -180.0, 180.0
_LAT_MIN, _LAT_MAX = -90.0, 90.0


def lonlat_to_bins(lon, lat, res: int = MAX_RES):
    """Floor-bin lon/lat into ``2^res`` bins per dimension (upper clamp).

    Returns (x_bins, y_bins) as int64 arrays. NaNs map to bin -1 (callers
    route them to the reserved no-cell partition, the semantics of
    IndexPartitioner's catch-all partition,
    /root/reference/geomesa-spark/geomesa-spark-sql/src/main/scala/org/
    apache/spark/sql/IndexPartitioner.scala:18-29).
    """
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    n = np.int64(1) << res
    with np.errstate(invalid="ignore"):
        x = np.floor((lon - _LON_MIN) / (_LON_MAX - _LON_MIN) * n)
        y = np.floor((lat - _LAT_MIN) / (_LAT_MAX - _LAT_MIN) * n)
    bad = ~(np.isfinite(lon) & np.isfinite(lat)
            & (lon >= _LON_MIN) & (lon <= _LON_MAX)
            & (lat >= _LAT_MIN) & (lat <= _LAT_MAX))
    x = np.clip(np.nan_to_num(x, nan=0.0), 0, float(n - 1)).astype(np.int64)
    y = np.clip(np.nan_to_num(y, nan=0.0), 0, float(n - 1)).astype(np.int64)
    x[bad] = -1
    y[bad] = -1
    return x, y


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each int64 so bit i lands at position 2i."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _squash(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: collect even bits back into the low 32 bits."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def z_encode(x_bins, y_bins) -> np.ndarray:
    """Morton-interleave bin indices: x in even bits, y in odd bits.

    Negative (invalid) bins yield cell -1.
    """
    x = np.asarray(x_bins, dtype=np.int64)
    y = np.asarray(y_bins, dtype=np.int64)
    z = (_spread(x) | (_spread(y) << np.uint64(1))).astype(np.int64)
    z = np.where((x < 0) | (y < 0), np.int64(-1), z)
    return z


def z_decode(z) -> tuple[np.ndarray, np.ndarray]:
    """Morton code -> (x_bins, y_bins); cell -1 -> (-1, -1)."""
    z = np.asarray(z, dtype=np.int64)
    x = _squash(z.astype(np.uint64)).astype(np.int64)
    y = _squash(z.astype(np.uint64) >> np.uint64(1)).astype(np.int64)
    bad = z < 0
    x[bad] = -1
    y[bad] = -1
    return x, y


def cell_id(lon, lat, res: int = MAX_RES) -> np.ndarray:
    """Full cell id (Morton code at ``res`` bits/dim) of lon/lat points."""
    x, y = lonlat_to_bins(lon, lat, res)
    return z_encode(x, y)


def cell_prefix(cell, from_res: int = MAX_RES, to_res: int = PARTITION_RES) -> np.ndarray:
    """Truncate cell ids from ``from_res`` to coarser ``to_res``.

    The partition column: analog of the FS datastore's Z2 partition name at
    fixed resolution. cell -1 stays -1 (reserved partition).
    """
    cell = np.asarray(cell, dtype=np.int64)
    shift = np.uint64(2 * (from_res - to_res))
    out = (cell.astype(np.uint64) >> shift).astype(np.int64)
    return np.where(cell < 0, np.int64(-1), out)


def cell_to_bins(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Alias of z_decode for readability at a stated resolution."""
    del res  # resolution is implicit in the code; kept for call-site clarity
    return z_decode(cell)


def cell_bounds(cell, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell at resolution res."""
    x, y = z_decode(cell)
    n = float(1 << res)
    dx = (_LON_MAX - _LON_MIN) / n
    dy = (_LAT_MAX - _LAT_MIN) / n
    lon0 = _LON_MIN + x * dx
    lat0 = _LAT_MIN + y * dy
    return lon0, lat0, lon0 + dx, lat0 + dy


def cell_center(cell, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center lon/lat (the reference decodes bins to bin centers)."""
    x0, y0, x1, y1 = cell_bounds(cell, res)
    return (x0 + x1) / 2.0, (y0 + y1) / 2.0


def bbox_cover(xmin: float, ymin: float, xmax: float, ymax: float,
               res: int = PARTITION_RES, max_cells: int = 1 << 20) -> np.ndarray:
    """All cells at ``res`` overlapping the bbox (inclusive), sorted.

    Over-selects at bin boundaries, never under-selects — the exactness rule
    of the reference's range decomposition (ranges cover, secondary filter
    refines). Antimeridian-crossing boxes (xmin > xmax) split into two.
    Raises if the cover would exceed ``max_cells`` (range-budget analog of
    ``ScanRangesTarget``, Z2IndexKeySpace.scala:102-104).
    """
    if xmin > xmax:  # antimeridian crossing: split into two world-order boxes
        left = bbox_cover(xmin, ymin, _LON_MAX, ymax, res, max_cells)
        right = bbox_cover(_LON_MIN, ymin, xmax, ymax, res, max_cells)
        return np.unique(np.concatenate([left, right]))
    ymin, ymax = max(ymin, _LAT_MIN), min(ymax, _LAT_MAX)
    xmin, xmax = max(xmin, _LON_MIN), min(xmax, _LON_MAX)
    if xmin > xmax or ymin > ymax:
        return np.empty(0, dtype=np.int64)
    bx0, by0 = (int(v[0]) for v in lonlat_to_bins(xmin, ymin, res))
    bx1, by1 = (int(v[0]) for v in lonlat_to_bins(xmax, ymax, res))
    nx = bx1 - bx0 + 1
    ny = by1 - by0 + 1
    if nx * ny > max_cells:
        raise ValueError(f"bbox cover of {nx * ny} cells exceeds budget {max_cells}")
    xs = np.arange(bx0, bx1 + 1, dtype=np.int64)
    ys = np.arange(by0, by1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.sort(z_encode(gx.ravel(), gy.ravel()))


def k_ring(cell: int, res: int, k: int) -> np.ndarray:
    """Cells within Chebyshev distance k of ``cell`` at resolution ``res``.

    Longitude wraps around the antimeridian; latitude clamps at the poles.
    Used by kNN's expanding-window candidate search (semantics of the
    expanding query window in KNearestNeighborSearchProcess.scala:222-301).
    """
    x, y = z_decode(np.asarray([cell], dtype=np.int64))
    x, y = int(x[0]), int(y[0])
    n = 1 << res
    xs = np.arange(x - k, x + k + 1, dtype=np.int64) % n  # lon wraps
    ys = np.arange(max(0, y - k), min(n - 1, y + k) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.unique(z_encode(gx.ravel(), gy.ravel()))
