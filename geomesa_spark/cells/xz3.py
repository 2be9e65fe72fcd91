"""XZ3 space-filling curve: geometries with spatial extension + time,
vectorized in numpy.

The spatio-temporal sibling of XZ2: an octree over (lon, lat,
time-offset-within-epoch) with the XZ enlarged-element trick, so extended
geometries (bboxes) with time intervals index at the deepest level whose
doubled cell still contains them. Semantics follow GeoMesa's XZ3
implementation of the published XZ-Ordering algorithm (cited for parity,
no code copied):
/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/XZ3SFC.scala
  - 3D sequence codes over the octree path (base-8 analog of XZ2's :264-286)
  - resolution from the max normalized dimension + position refinement
  - query cover via octree descent with range budgeting
Time is binned exactly like Z3 (BinnedTime.scala:16-60): epoch = whole
weeks since 1970 from the interval's start, offsets clamped to the week
(intervals crossing a week boundary clamp at the week end and therefore
over-select — the exactness rule: covers may over-select, never
under-select; the exact predicate refines downstream).

Key layout [epoch][xz3] mirrors XZ3IndexKeySpace.
"""

from __future__ import annotations

import numpy as np

from geomesa_spark.cells.z3 import WEEK_SECONDS

XZ3_MAX_RES = 10  # octree levels; 8^10 leaf cells is ample for pruning

_LON_MIN, _LON_SPAN = -180.0, 360.0
_LAT_MIN, _LAT_SPAN = -90.0, 180.0


def _norm3(xmin, ymin, tmin_s, xmax, ymax, tmax_s):
    """Normalize bbox + time interval into the unit cube; time offsets are
    seconds within the epoch week (clamped)."""
    x0 = (np.asarray(xmin, dtype=np.float64) - _LON_MIN) / _LON_SPAN
    x1 = (np.asarray(xmax, dtype=np.float64) - _LON_MIN) / _LON_SPAN
    y0 = (np.asarray(ymin, dtype=np.float64) - _LAT_MIN) / _LAT_SPAN
    y1 = (np.asarray(ymax, dtype=np.float64) - _LAT_MIN) / _LAT_SPAN
    t0 = np.asarray(tmin_s, dtype=np.float64) / WEEK_SECONDS
    t1 = np.asarray(tmax_s, dtype=np.float64) / WEEK_SECONDS
    clip = lambda v: np.clip(v, 0.0, 1.0)  # noqa: E731
    return (clip(x0), clip(y0), clip(t0), clip(x1), clip(y1), clip(t1))


def _max_level(x0, y0, t0, x1, y1, t1, res: int) -> np.ndarray:
    """Deepest level whose doubled (2x per axis) cell contains the
    element — the XZ 'floor(log_0.5(max_dim))' rule with the
    position-dependent refinement, in three dimensions."""
    w = np.maximum(x1 - x0, 1e-15)
    h = np.maximum(y1 - y0, 1e-15)
    d = np.maximum(t1 - t0, 1e-15)
    dim = np.maximum(np.maximum(w, h), d)
    l1 = np.minimum(np.floor(np.log2(1.0 / dim)).astype(np.int64), res)
    l1 = np.maximum(l1, 0)
    s = np.power(0.5, l1.astype(np.float64))
    fits = ((np.floor(x0 / s) + 2) * s >= x1) & \
           ((np.floor(y0 / s) + 2) * s >= y1) & \
           ((np.floor(t0 / s) + 2) * s >= t1)
    return np.where(fits, l1, np.maximum(l1 - 1, 0))


def _subtree(res: int, level: int) -> int:
    """Code span of an element's whole subtree at ``level``:
    8 * (8^(res-level) - 1) / 7 — one past it is the next sibling."""
    return (8 ** (res - level + 1) - 8) // 7


def xz3_code(xmin, ymin, xmax, ymax, off0_s, off1_s,
             res: int = XZ3_MAX_RES) -> np.ndarray:
    """Sequence code of each (bbox, time-offset interval); offsets are
    seconds within the element's epoch week (already clamped by the
    caller's per-epoch split)."""
    x0, y0, tt0, x1, y1, tt1 = _norm3(xmin, ymin, off0_s, xmax, ymax,
                                      off1_s)
    lvl = _max_level(x0, y0, tt0, x1, y1, tt1, res)
    n = len(np.atleast_1d(lvl))
    code = np.zeros(n, dtype=np.int64)
    cx = np.zeros(n)
    cy = np.zeros(n)
    ct = np.zeros(n)
    size = np.ones(n)
    for i in range(res):
        active = lvl > i
        if not active.any():
            break
        half = size / 2
        right = x0 >= cx + half
        top = y0 >= cy + half
        late = tt0 >= ct + half
        oct_ = (right.astype(np.int64) * 4 + top.astype(np.int64) * 2
                + late.astype(np.int64))
        inc = oct_ * ((8 ** (res - i) - 1) // 7) + 1
        code = np.where(active, code + inc, code)
        cx = np.where(active & right, cx + half, cx)
        cy = np.where(active & top, cy + half, cy)
        ct = np.where(active & late, ct + half, ct)
        size = np.where(active, half, size)
    return code


def xz3_index(xmin, ymin, xmax, ymax, t0_us, t1_us,
              res: int = XZ3_MAX_RES) -> tuple[np.ndarray, np.ndarray]:
    """(epoch_week, sequence code) of each (bbox, time interval), binning
    by the interval START's week (the offset of t1 clamps at the week
    end). Single-epoch convenience — the storage writer
    (operators/xz3_query.with_xz3) instead duplicates an element into
    EVERY spanned week, per BinnedTime.boundsToIndexableDates."""
    t0_us = np.asarray(t0_us, dtype=np.int64)
    t1_us = np.asarray(t1_us, dtype=np.int64)
    sec0 = t0_us // 1_000_000
    epoch = sec0 // WEEK_SECONDS
    off0 = sec0 - epoch * WEEK_SECONDS
    # t1 rounds UP to seconds: flooring would shrink the coded extent, and
    # a shrunk element can land in a cell whose enlarged span ends before
    # the true t1 — an under-selecting cover. Widening is always sound.
    off1 = np.minimum(-((-t1_us) // 1_000_000) - epoch * WEEK_SECONDS,
                      WEEK_SECONDS)
    return epoch, xz3_code(xmin, ymin, xmax, ymax, off0, off1, res)


def xz3_covers(qxmin: float, qymin: float, qxmax: float, qymax: float,
               qt0_s: float, qt1_s: float,
               res: int = XZ3_MAX_RES,
               max_ranges: int = 4096) -> list[tuple[int, int]]:
    """Sequence-code ranges whose elements may intersect the query bbox
    AND time interval (offsets in seconds within one epoch week).

    BFS octree descent with a range budget (ScanRangesTarget shape): a
    fully-contained octant contributes its whole code subtree; a partial
    overlap contributes its own element code and recurses; at budget the
    frontier drains as whole subtrees. Over-selects (enlarged-element
    semantics), never under-selects.
    """
    from collections import deque

    if qxmin > qxmax:
        # antimeridian-crossing query: split into the two world-order
        # boxes and re-merge — the single-interval overlap test would
        # otherwise under-select (see xz2_covers)
        a = xz3_covers(qxmin, qymin, 180.0, qymax, qt0_s, qt1_s,
                       res, max_ranges // 2)
        b = xz3_covers(-180.0, qymin, qxmax, qymax, qt0_s, qt1_s,
                       res, max_ranges // 2)
        both = sorted(a + b)
        merged = [both[0]]
        for lo, hi in both[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    qx0, qy0, qt0, qx1, qy1, qt1 = (
        float(v) for v in _norm3(qxmin, qymin, qt0_s, qxmax, qymax, qt1_s))
    ranges: list[tuple[int, int]] = []
    # an element at (cx, cy, ct, size) is enlarged to a 2*size cube
    queue = deque([(0.0, 0.0, 0.0, 1.0, 0, 0)])  # cx, cy, ct, size, code, lvl
    while queue:
        cx, cy, ct, size, code, level = queue.popleft()
        span = _subtree(res, level)
        if cx > qx1 or cx + 2 * size <= qx0 or \
           cy > qy1 or cy + 2 * size <= qy0 or \
           ct > qt1 or ct + 2 * size <= qt0:
            continue
        all_match = (cx >= qx0 and cy >= qy0 and ct >= qt0
                     and cx + size <= qx1 and cy + size <= qy1
                     and ct + size <= qt1)
        if level >= res or all_match or \
                len(ranges) + len(queue) >= max_ranges:
            ranges.append((code, code + span))
            continue
        ranges.append((code, code))  # the element at this exact level
        half = size / 2
        for oct_ in range(8):
            ocx = cx + half * (oct_ // 4)
            ocy = cy + half * ((oct_ // 2) % 2)
            oct_t = ct + half * (oct_ % 2)
            inc = oct_ * ((8 ** (res - level) - 1) // 7) + 1
            queue.append((ocx, ocy, oct_t, half, code + inc, level + 1))
    ranges.sort()
    merged = [ranges[0]]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
