"""XZ2 space-filling curve for geometries with spatial extension
(polygons/lines), vectorized in numpy.

Semantics follow GeoMesa's XZ2 implementation of the published algorithm
("XZ-Ordering: A Space-Filling Curve for Objects with Spatial Extension",
Boehm, Klump, Kriegel) — cited for parity, no code copied:
/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/XZ2SFC.scala
  - resolution selection from the bbox's max dimension (:54-77)
  - sequence-code computation over the quadtree path (:264-286)
  - query cover via quadtree descent (:146-252)

Model: an object with bbox B is indexed at the deepest level l where an
enlarged quadrant (2x cell extension to the upper-right) still contains B;
its code is the base-4 path prefix encoded as a sequence number:

    code(path) = sum_{i<l} (path_i * (4^(l-i) - 1) / 3 + 1)

Covers over-select, never under-select (the engine's exactness rule);
the exact predicate refines downstream.
"""

from __future__ import annotations

import numpy as np

XZ2_MAX_RES = 12  # quadtree levels; 4^12 leaf cells is ample for pruning

_LON_MIN, _LON_SPAN = -180.0, 360.0
_LAT_MIN, _LAT_SPAN = -90.0, 180.0


def _norm(xmin, ymin, xmax, ymax):
    x0 = (np.asarray(xmin, dtype=np.float64) - _LON_MIN) / _LON_SPAN
    x1 = (np.asarray(xmax, dtype=np.float64) - _LON_MIN) / _LON_SPAN
    y0 = (np.asarray(ymin, dtype=np.float64) - _LAT_MIN) / _LAT_SPAN
    y1 = (np.asarray(ymax, dtype=np.float64) - _LAT_MIN) / _LAT_SPAN
    clip = lambda v: np.clip(v, 0.0, 1.0)  # noqa: E731
    return clip(x0), clip(y0), clip(x1), clip(y1)


def _max_level(x0, y0, x1, y1, res: int) -> np.ndarray:
    """Deepest level whose doubled cell still contains the (normalized)
    bbox: the enlarged element covers [x, x + 2*w) so an object fits at
    level l iff its width and height are <= the level's cell size AND it
    does not cross a cell boundary by more than one extra cell — the
    standard XZ 'l(s) = floor(log_0.5(max_dim))' rule with the
    position-dependent refinement."""
    w = np.maximum(x1 - x0, 1e-15)
    h = np.maximum(y1 - y0, 1e-15)
    dim = np.maximum(w, h)
    l1 = np.minimum(np.floor(np.log2(1.0 / dim)).astype(np.int64), res)
    l1 = np.maximum(l1, 0)
    # position refinement: at level l the element starting in cell c spans
    # [c*s, c*s + 2s); if the object crosses that bound, back off one level
    s = np.power(0.5, l1.astype(np.float64))
    fits = ((np.floor(x0 / s) + 2) * s >= x1) & \
           ((np.floor(y0 / s) + 2) * s >= y1)
    return np.where(fits, l1, np.maximum(l1 - 1, 0))


def xz2_index(xmin, ymin, xmax, ymax, res: int = XZ2_MAX_RES) -> np.ndarray:
    """Sequence code of each bbox (vectorized)."""
    x0, y0, x1, y1 = _norm(xmin, ymin, xmax, ymax)
    lvl = _max_level(x0, y0, x1, y1, res)
    n = len(np.atleast_1d(lvl))
    code = np.zeros(n, dtype=np.int64)
    cx = np.zeros(n)
    cy = np.zeros(n)
    size = np.ones(n)
    for i in range(res):
        active = lvl > i
        if not active.any():
            break
        half = size / 2
        right = x0 >= cx + half
        top = y0 >= cy + half
        quad = right.astype(np.int64) * 2 + top.astype(np.int64)
        # code += quad * (4^(res-i) - 1) / 3 + 1 for active elements
        inc = quad * ((4 ** (res - i) - 1) // 3) + 1
        code = np.where(active, code + inc, code)
        cx = np.where(active & right, cx + half, cx)
        cy = np.where(active & top, cy + half, cy)
        size = np.where(active, half, size)
    return code


def xz2_covers(qxmin: float, qymin: float, qxmax: float, qymax: float,
               res: int = XZ2_MAX_RES,
               max_ranges: int = 4096) -> list[tuple[int, int]]:
    """Sequence-code ranges whose elements may intersect the query bbox.

    Breadth-first quadtree descent (the reference's ScanRangesTarget
    budgeting shape): a quadrant whose cell lies fully inside the query
    contributes its whole code subtree; a partially-overlapping quadrant
    contributes its own element code and recurses. When the range budget
    is reached, the remaining frontier — uniform depth, thanks to BFS —
    drains as whole subtrees (sound over-select, bounded count).
    Over-selects (enlarged-element semantics), never under-selects.
    """
    from collections import deque

    if qxmin > qxmax:
        # antimeridian-crossing query: the single-interval overlap test
        # below would reject every deep element (only near-root elements
        # span both edges), under-selecting — the one thing this function
        # must never do. Split into the two world-order boxes (the
        # z2.bbox_cover convention) and re-merge the range union.
        a = xz2_covers(qxmin, qymin, 180.0, qymax, res, max_ranges // 2)
        b = xz2_covers(-180.0, qymin, qxmax, qymax, res, max_ranges // 2)
        both = sorted(a + b)
        merged = [both[0]]
        for lo, hi in both[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    qx0, qy0, qx1, qy1 = (float(v) for v in _norm(qxmin, qymin, qxmax, qymax))
    ranges: list[tuple[int, int]] = []
    # an element at (cx, cy, size) is enlarged to [cx, cx+2s) x [cy, cy+2s);
    # it may intersect the query iff cx <= qx1 and cx + 2s > qx0 (same in y)
    queue = deque([(0.0, 0.0, 1.0, 0, 0)])  # cx, cy, size, code, level
    while queue:
        cx, cy, size, code, level = queue.popleft()
        # subtree of an element at this level spans [code, code + 4*T],
        # T = (4^(res-level) - 1)/3; one past that is the next sibling's
        # code, so the bound must be exact or range-merging cascades
        # across siblings
        span = (4 ** (res - level + 1) - 4) // 3
        if cx > qx1 or cx + 2 * size <= qx0 or \
           cy > qy1 or cy + 2 * size <= qy0:
            continue
        # all elements in this subtree necessarily touch the query
        all_match = (cx >= qx0 and cy >= qy0
                     and cx + size <= qx1 and cy + size <= qy1)
        if level >= res or all_match or \
                len(ranges) + len(queue) >= max_ranges:
            ranges.append((code, code + span))
            continue
        ranges.append((code, code))  # the element at this exact level
        half = size / 2
        for quad in range(4):
            qcx = cx + half * (quad // 2)
            qcy = cy + half * (quad % 2)
            inc = quad * ((4 ** (res - level) - 1) // 3) + 1
            queue.append((qcx, qcy, half, code + inc, level + 1))
    ranges.sort()
    merged = [ranges[0]]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
