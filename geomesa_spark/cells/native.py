"""Z2 cell id as a native Catalyst column expression (zero Python).

Same semantics as the numpy kernels in ``cells.z2`` (floor-bin + upper
clamp, Morton interleave, -1 for null/NaN/out-of-range — the reserved-
partition sentinel), but built from Spark SQL bit operations so cell
assignment runs inside whole-stage codegen. The pandas-UDF kernel remains
for array-valued operations (covers, k-rings); hot-path point assignment
uses this expression.

Parity is property-tested against ``cells.z2.cell_id`` in
tests/test_cells_native.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from geomesa_spark.cells.z2 import MAX_RES, PARTITION_RES

_LON_MIN, _LON_SPAN = -180.0, 360.0
_LAT_MIN, _LAT_SPAN = -90.0, 180.0


def _bin_expr(v: Column, vmin: float, span: float, res: int) -> Column:
    n = 1 << res
    raw = F.floor((v - F.lit(vmin)) / F.lit(span) * F.lit(float(n)))
    return F.greatest(F.least(raw, F.lit(n - 1)), F.lit(0)).cast("long")


def _interleave(x: Column, y: Column, res: int) -> Column:
    out = F.lit(0).cast("long")
    for i in range(res):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)),
                        2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)),
                        2 * i + 1))
    return out


def cell_expr(lon, lat, res: int = PARTITION_RES) -> Column:
    """Morton cell id of (lon, lat) at ``res`` bits/dim; -1 for bad rows."""
    if not 0 < res <= MAX_RES:
        raise ValueError(f"res must be in (0, {MAX_RES}]")
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    ok = (lon_c.isNotNull() & lat_c.isNotNull()
          & ~F.isnan(lon_c) & ~F.isnan(lat_c)
          & (lon_c >= _LON_MIN) & (lon_c <= _LON_MIN + _LON_SPAN)
          & (lat_c >= _LAT_MIN) & (lat_c <= _LAT_MIN + _LAT_SPAN))
    morton = _interleave(_bin_expr(lon_c, _LON_MIN, _LON_SPAN, res),
                         _bin_expr(lat_c, _LAT_MIN, _LAT_SPAN, res), res)
    return F.when(ok, morton).otherwise(F.lit(-1).cast("long"))


def cell_prefix_expr(cell: Column, from_res: int, to_res: int) -> Column:
    """Truncate a cell id to a coarser resolution (partition prefix)."""
    if to_res > from_res:
        raise ValueError("to_res must be <= from_res")
    return F.when(cell < 0, F.lit(-1).cast("long")).otherwise(
        F.shiftrightunsigned(cell, 2 * (from_res - to_res)).cast("long"))
