"""Z3 space-filling curve (2D + time), vectorized in numpy, plus a native
Catalyst expression.

Semantics follow GeoMesa's Z3 index (cited for parity, no code copied):

- Time binning: timestamps split into (epoch, offset) where epoch = whole
  periods since 1970-01-01 UTC and offset = seconds into the period —
  ``BinnedTime`` (/root/reference/geomesa-z3/src/main/scala/org/
  locationtech/geomesa/curve/BinnedTime.scala:16-60). Default period is
  one week, the reference's default interval.
- Cell id: 3-way Morton interleave of 21-bit normalized lon / lat /
  time-offset — ``Z3SFC`` (/root/reference/geomesa-z3/.../curve/
  Z3SFC.scala:22-63); key layout [epoch][z3] mirrors
  ``Z3IndexKeySpace`` (/root/reference/geomesa-index-api/.../index/z3/
  Z3IndexKeySpace.scala:64-97).
- Normalization: same floor-bin + upper-clamp as Z2
  (NormalizedDimension.scala:56-72).

The numpy kernels take int64 epoch-microsecond timestamps (Spark's
TimestampType physical value); the native expression composes the same
bit math from Catalyst ops so spatio-temporal binning runs in codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

Z3_RES = 21  # bits per dimension, as in the reference Z3 curve
WEEK_SECONDS = 7 * 24 * 3600

_LON_MIN, _LON_SPAN = -180.0, 360.0
_LAT_MIN, _LAT_SPAN = -90.0, 180.0


def binned_time(ts_us) -> tuple[np.ndarray, np.ndarray]:
    """(epoch_week, offset_seconds) from epoch-microsecond timestamps."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    sec = ts_us // 1_000_000
    epoch = sec // WEEK_SECONDS
    offset = sec - epoch * WEEK_SECONDS
    return epoch, offset


def _bins_1d(v, vmin: float, span: float, res: int) -> np.ndarray:
    """Bin index per value; NaN and out-of-range map to -1 (the z2
    ``lonlat_to_bins`` convention — callers route bad rows to the
    reserved no-cell partition instead of the arbitrary in-range cell
    that NaN's undefined float->int cast previously produced)."""
    n = np.int64(1) << res
    v = np.asarray(v, dtype=np.float64)
    bad = ~(np.isfinite(v) & (v >= vmin) & (v <= vmin + span))
    with np.errstate(invalid="ignore"):
        x = np.floor((np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
                      - vmin) / span * n)
    out = np.clip(x, 0, float(n - 1)).astype(np.int64)
    out[bad] = -1
    return out


def _spread3(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits so bit i lands at position 3i."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def z3_cell(lon, lat, ts_us, res: int = Z3_RES) -> tuple[np.ndarray, np.ndarray]:
    """(epoch_week, z3) for arrays of lon/lat/timestamp-us."""
    epoch, offset = binned_time(ts_us)
    xb = _bins_1d(lon, _LON_MIN, _LON_SPAN, res)
    yb = _bins_1d(lat, _LAT_MIN, _LAT_SPAN, res)
    tb = _bins_1d(offset, 0.0, float(WEEK_SECONDS), res)
    z = (_spread3(xb) | (_spread3(yb) << np.uint64(1))
         | (_spread3(tb) << np.uint64(2)))
    bad = (xb < 0) | (yb < 0) | (tb < 0)
    # sentinel BOTH outputs (z3_expr does the same): a bad row must not
    # land in a real (epoch, z) partition
    return (np.where(bad, np.int64(-1), epoch),
            np.where(bad, np.int64(-1), z.astype(np.int64)))


def z3_decode(z, res: int = Z3_RES) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Invert the 3-way interleave back to (x_bin, y_bin, t_bin)."""
    z = np.asarray(z, dtype=np.int64).astype(np.uint64)

    def squash(v):
        v &= np.uint64(0x1249249249249249)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
        return v.astype(np.int64)

    return squash(z.copy()), squash(z >> np.uint64(1)), squash(z >> np.uint64(2))


# --------------------------------------------------- native expressions

def epoch_week_expr(ts: Column | str) -> Column:
    t = F.col(ts) if isinstance(ts, str) else ts
    sec = F.floor(t.cast("timestamp").cast("double")).cast("long")
    return F.floor(sec / WEEK_SECONDS).cast("long")


def z3_expr(lon, lat, ts, res: int = Z3_RES, prefix_res: int | None = None) -> Column:
    """Native (epoch, z3) struct; ``prefix_res`` truncates z3 for coarse
    binning (Z3Histogram-style spatio-temporal heatmap keys)."""
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    t = F.col(ts) if isinstance(ts, str) else ts
    # null-safe leaves: the fold below must stay UNCONDITIONAL (CASE/IF
    # branches are excluded from whole-stage-codegen subexpression
    # elimination, so wrapping the 3*res-op Morton fold in a guard
    # re-evaluates each bin per bit — measured 3.4x on the z3 heatmap);
    # nulls are made harmless here at the leaves and bad rows are
    # sentineled at the end with branch-free bit math instead
    lon_s = F.coalesce(lon_c.cast("double"), F.lit(0.0))
    lat_s = F.coalesce(lat_c.cast("double"), F.lit(0.0))
    t_s = F.coalesce(t.cast("timestamp"), F.lit(0).cast("timestamp"))
    sec = F.floor(t_s.cast("double")).cast("long")
    epoch = F.floor(sec / WEEK_SECONDS).cast("long")
    offset = (sec - epoch * WEEK_SECONDS).cast("double")

    def bins(v: Column, vmin: float, span: float) -> Column:
        n = 1 << res
        raw = F.floor((v - F.lit(vmin)) / F.lit(span) * F.lit(float(n)))
        return F.greatest(F.least(raw, F.lit(n - 1)), F.lit(0)).cast("long")

    xb = bins(lon_s, _LON_MIN, _LON_SPAN)
    yb = bins(lat_s, _LAT_MIN, _LAT_SPAN)
    tb = bins(offset, 0.0, float(WEEK_SECONDS))
    z = F.lit(0).cast("long")
    for i in range(res):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(xb, i).bitwiseAND(F.lit(1)),
                        3 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(yb, i).bitwiseAND(F.lit(1)),
                        3 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(tb, i).bitwiseAND(F.lit(1)),
                        3 * i + 2))
    if prefix_res is not None:
        z = F.shiftrightunsigned(z, 3 * (res - prefix_res)).cast("long")
    # null/NaN/out-of-range guard, matching native.py cell_expr and the
    # numpy kernel: bad rows get the -1 reserved sentinel instead of an
    # arbitrary in-range cell. Branch-free: m is all-ones when the row is
    # valid, all-zeros otherwise, so (v & m) | ~m is v-or-minus-one with
    # no conditional around the expensive fold (see the CSE note above).
    ok = (lon_c.isNotNull() & lat_c.isNotNull() & t.isNotNull()
          & ~F.isnan(lon_c.cast("double")) & ~F.isnan(lat_c.cast("double"))
          & (lon_c >= _LON_MIN) & (lon_c <= _LON_MIN + _LON_SPAN)
          & (lat_c >= _LAT_MIN) & (lat_c <= _LAT_MIN + _LAT_SPAN))
    m = -F.coalesce(ok, F.lit(False)).cast("long")
    return F.struct(
        epoch.bitwiseAND(m).bitwiseOR(F.bitwise_not(m)).alias("epoch"),
        z.bitwiseAND(m).bitwiseOR(F.bitwise_not(m)).alias("z3"))
