"""S2-style spherical cell ids, vectorized in numpy.

The reference ships an S2 index mode (/root/reference/geomesa-z3/src/
main/scala/org/locationtech/geomesa/curve/S2SFC.scala:17-66,
/root/reference/geomesa-index-api/.../index/s2/S2IndexKeySpace.scala)
backed by the Google S2 library. This module re-derives the published
S2 cell scheme from the public algorithm description — no code copied:

- sphere -> cube: 6 faces (+x,+y,+z,-x,-y,-z), per-face (u,v) in [-1,1];
- the quadratic reprojection u<->s reducing area distortion;
- a Hilbert space-filling curve over each face's (i,j) grid (the
  standard 4-entry position/orientation tables with swap and invert
  bits, odd faces starting swapped);
- 64-bit cell id layout: [3 face bits][2*level position bits][1][0...].

Correctness is pinned by structural laws in tests/test_s2.py (Hilbert
adjacency + bijectivity, prefix/hierarchy containment, round-trips,
cover soundness) rather than by comparing against the S2 library (not
available in this environment).

Cover: breadth-first descent over the cell tree. Each S2 cell is a
spherical quadrilateral bounded by great-circle arcs (u=const/v=const
planes through the origin), so the cell lies inside the spherical cap
centered at its center with radius = max corner distance; the cap's
lat/lon bbox (poleward-edge cos widening) gives a CONSERVATIVE
intersection test — covers over-select, never under-select.
"""

from __future__ import annotations

import math
from collections import deque

import numpy as np
import pandas as pd

S2_MAX_LEVEL = 30


def _signed64(v: int) -> int:
    """Wrap a canonical (unsigned) S2 id into the signed-64 space Spark
    long columns use (faces 4-5 set bit 63)."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v

# Hilbert tables: pos_to_ij[orientation][pos] -> ij (i_bit*2 + j_bit)
_POS_TO_IJ = np.array([[0, 1, 3, 2],
                       [0, 2, 3, 1],
                       [3, 2, 0, 1],
                       [3, 1, 0, 2]], dtype=np.int64)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_SWAP, _INVERT = 1, 2
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.int64)


def _lonlat_to_xyz(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az),
                    np.where(x >= 0, 0, 3),
                    np.where(ay >= az,
                             np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5)))
    with np.errstate(divide="ignore", invalid="ignore"):
        sel = face == 0
        u = np.where(sel, y / np.where(x == 0, 1, x), 0.0)
        v = np.where(sel, z / np.where(x == 0, 1, x), 0.0)
        sel = face == 1
        u = np.where(sel, -x / np.where(y == 0, 1, y), u)
        v = np.where(sel, z / np.where(y == 0, 1, y), v)
        sel = face == 2
        u = np.where(sel, -x / np.where(z == 0, 1, z), u)
        v = np.where(sel, -y / np.where(z == 0, 1, z), v)
        sel = face == 3
        u = np.where(sel, z / np.where(x == 0, 1, x), u)
        v = np.where(sel, y / np.where(x == 0, 1, x), v)
        sel = face == 4
        u = np.where(sel, z / np.where(y == 0, 1, y), u)
        v = np.where(sel, -x / np.where(y == 0, 1, y), v)
        sel = face == 5
        u = np.where(sel, -y / np.where(z == 0, 1, z), u)
        v = np.where(sel, -x / np.where(z == 0, 1, z), v)
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face: int, u, v):
    if face == 0:
        return np.ones_like(u), u, v
    if face == 1:
        return -u, np.ones_like(u), v
    if face == 2:
        return -u, -v, np.ones_like(u)
    if face == 3:
        return -np.ones_like(u), -v, -u
    if face == 4:
        return v, -np.ones_like(u), -u
    return v, u, -np.ones_like(u)


def _uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    # clip keeps the unselected where-branch out of sqrt's domain error
    return np.where(u >= 0,
                    0.5 * np.sqrt(1.0 + 3.0 * np.maximum(u, 0.0)),
                    1.0 - 0.5 * np.sqrt(1.0 - 3.0 * np.minimum(u, 0.0)))


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0)


def _ij_to_pos(face, i, j, level: int) -> np.ndarray:
    """Hilbert position of (i, j) on ``face`` at ``level`` (vectorized
    per-level table walk; odd faces start with the swap orientation)."""
    orient = (face & 1) * _SWAP
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = pos * 4 + p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _pos_to_ij_arr(face, pos, level: int):
    orient = (face & 1) * _SWAP
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orient, p]
        i = i * 2 + (ij >> 1)
        j = j * 2 + (ij & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


def s2_cell_id(lon, lat, level: int = 16) -> np.ndarray:
    """Canonical-layout S2 cell id of each (lon, lat) at ``level``:
    [face:3][hilbert pos:2*level][1][0...] in a 64-bit integer."""
    if not 0 < level <= S2_MAX_LEVEL:
        raise ValueError(f"level must be in (0, {S2_MAX_LEVEL}]")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip(np.floor(_uv_to_st(u) * n), 0, float(n - 1)).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * n), 0, float(n - 1)).astype(np.int64)
    pos = _ij_to_pos(face, i, j, level)
    shift = 2 * (S2_MAX_LEVEL - level)
    return ((face.astype(np.int64) << 61) | (pos << (shift + 1))
            | (np.int64(1) << shift))


def s2_decode(ids, level: int):
    """(face, i, j) of cell ids at ``level``."""
    ids = np.asarray(ids, dtype=np.int64)
    face = (ids >> 61) & 7
    shift = 2 * (S2_MAX_LEVEL - level)
    pos = (ids >> (shift + 1)) & ((np.int64(1) << (2 * level)) - 1)
    i, j = _pos_to_ij_arr(face, pos, level)
    return face, i, j


def s2_cell_center(ids, level: int):
    """(lon, lat) of each cell's center."""
    face, i, j = s2_decode(ids, level)
    n = float(1 << level)
    out_lon = np.empty(len(np.atleast_1d(face)))
    out_lat = np.empty_like(out_lon)
    fa = np.atleast_1d(face)
    ia = np.atleast_1d(i)
    ja = np.atleast_1d(j)
    for f in range(6):
        sel = fa == f
        if not sel.any():
            continue
        u = _st_to_uv((ia[sel] + 0.5) / n)
        v = _st_to_uv((ja[sel] + 0.5) / n)
        x, y, z = _face_uv_to_xyz(f, u, v)
        out_lon[sel] = np.degrees(np.arctan2(y, x))
        out_lat[sel] = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return out_lon, out_lat


def s2_parent(ids, level: int, parent_level: int) -> np.ndarray:
    """Parent cell id at a coarser level (prefix truncation)."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    ids = np.asarray(ids, dtype=np.int64)
    shift = 2 * (S2_MAX_LEVEL - parent_level)
    return (ids >> (shift + 1) << (shift + 1)) | (np.int64(1) << shift)


def _cell_cap_bbox(face: int, i: int, j: int, level: int):
    """Conservative lat/lon bbox: spherical cap at the cell center with
    radius = max corner distance (cells are great-circle quadrilaterals,
    so all cell points lie within that cap)."""
    n = float(1 << level)
    cu = _st_to_uv(np.array([(i + 0.5) / n]))[0]
    cv = _st_to_uv(np.array([(j + 0.5) / n]))[0]
    cx, cy, cz = _face_uv_to_xyz(face, np.array([cu]), np.array([cv]))
    cn = math.sqrt(cx[0] ** 2 + cy[0] ** 2 + cz[0] ** 2)
    clat = math.degrees(math.atan2(cz[0], math.hypot(cx[0], cy[0])))
    clon = math.degrees(math.atan2(cy[0], cx[0]))
    r = 0.0
    for di in (0.0, 1.0):
        for dj in (0.0, 1.0):
            u = _st_to_uv(np.array([(i + di) / n]))[0]
            v = _st_to_uv(np.array([(j + dj) / n]))[0]
            x, y, z = _face_uv_to_xyz(face, np.array([u]), np.array([v]))
            dot = (cx[0] * x[0] + cy[0] * y[0] + cz[0] * z[0]) / (
                cn * math.sqrt(x[0] ** 2 + y[0] ** 2 + z[0] ** 2))
            r = max(r, math.degrees(math.acos(max(-1.0, min(1.0, dot)))))
    lat0, lat1 = clat - r, clat + r
    if lat1 >= 89.999 or lat0 <= -89.999:
        return max(-90.0, lat0), min(90.0, lat1), -180.0, 180.0
    phi_m = min(89.99, max(abs(lat0), abs(lat1)))
    dlon = min(180.0, r / max(math.cos(math.radians(phi_m)), 1e-9))
    return lat0, lat1, clon - dlon, clon + dlon


def _bbox_overlap(qx0, qy0, qx1, qy1, lat0, lat1, lon0, lon1) -> bool:
    if lat1 < qy0 or lat0 > qy1:
        return False
    if lon1 - lon0 >= 360.0:
        return True
    # normalize the cell lon interval onto [-180, 180] with wrap
    spans = []
    lo, hi = lon0, lon1
    if lo < -180.0:
        spans.append((lo + 360.0, 180.0))
        lo = -180.0
    if hi > 180.0:
        spans.append((-180.0, hi - 360.0))
        hi = 180.0
    spans.append((lo, hi))
    return any(not (b < qx0 or a > qx1) for a, b in spans)


def _cell_range_u(face: int, i: int, j: int, lvl: int,
                  target_level: int) -> tuple[int, int]:
    """Unsigned id range covering every level-``target_level`` descendant
    of cell (face, i, j, lvl): [cid - lowbit + 1, cid + lowbit - 1]
    clipped inward so the endpoints land exactly on the first/last
    target-level id (canonical lsb-marker encoding)."""
    pos = int(_ij_to_pos(np.asarray([face]), np.asarray([i]),
                         np.asarray([j]), lvl)[0])
    shift = 2 * (S2_MAX_LEVEL - lvl)
    lowbit = 1 << shift
    cid = (face << 61) | (pos << (shift + 1)) | lowbit
    t = 1 << (2 * (S2_MAX_LEVEL - target_level))
    return cid - lowbit + t, cid + lowbit - t


def s2_cover_ranges(qx0: float, qy0: float, qx1: float, qy1: float,
                    level: int = 10,
                    max_ranges: int = 4096) -> np.ndarray:
    """Budget-BOUNDED cover of the query bbox as merged, sorted id ranges
    (shape (k, 2) int64, inclusive endpoints, signed-64 Spark space).

    A level-``level`` cell id falls inside one of the ranges iff its cell
    may intersect the bbox (sound over-selection). The BFS stops
    descending a frontier cell when the budget would overflow and emits
    that cell's whole descendant range instead — so the output is always
    <= max_ranges entries, regardless of how large the bbox is. This is
    the reference's scan-range form (S2IndexKeySpace.getRangeBytes
    emits BoundedByteRange scan ranges, not cell membership lists).
    """
    # antimeridian-crossing query (qx0 > qx1): split into the two
    # world-order lon spans, tested disjunctively against every cell —
    # the single-interval overlap test rejected EVERY cell for an
    # inverted box, returning an empty (under-selecting) cover, the one
    # thing the module contract forbids. z2.bbox_cover splits the same
    # way (z2.py:170).
    qspans = [(qx0, qx1)] if qx0 <= qx1 else [(qx0, 180.0), (-180.0, qx1)]
    ranges: list[tuple[int, int]] = []
    queue = deque((f, 0, 0, 0) for f in range(6))  # face, i, j, lvl
    while queue:
        face, i, j, lvl = queue.popleft()
        lat0, lat1, lon0, lon1 = _cell_cap_bbox(face, i, j, lvl)
        if not any(_bbox_overlap(a, qy0, b, qy1, lat0, lat1, lon0, lon1)
                   for a, b in qspans):
            continue
        if lvl == level or len(ranges) + len(queue) * 4 >= max_ranges:
            ranges.append(_cell_range_u(face, i, j, lvl, level))
            continue
        for ci in (2 * i, 2 * i + 1):
            for cj in (2 * j, 2 * j + 1):
                queue.append((face, ci, cj, lvl + 1))
    if not ranges:
        return np.empty((0, 2), dtype=np.int64)
    # merge touching/overlapping ranges (adjacent Hilbert cells are
    # contiguous in id space, so dense covers collapse hard)
    t = 1 << (2 * (S2_MAX_LEVEL - level))
    ranges.sort()
    merged: list[list[int]] = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        # never merge across 2^63 (face 3|4 seam): a straddling range
        # would map to (positive lo, negative hi) in signed Spark space
        if lo <= merged[-1][1] + 2 * t and (lo >= 1 << 63) == (
                merged[-1][0] >= 1 << 63):
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    # face subtrees never straddle 2^63, so signed mapping keeps lo<=hi
    return np.asarray([[_signed64(lo), _signed64(hi)] for lo, hi in merged],
                      dtype=np.int64)


def s2_cover_bbox(qx0: float, qy0: float, qx1: float, qy1: float,
                  level: int = 10,
                  max_cells: int = 4096) -> np.ndarray:
    """Explicit level-``level`` cells that may intersect the query bbox
    (sound over-selection via the cap-bbox test). The expansion is
    HARD-BOUNDED: if the exact cover would exceed ``max_cells`` ids a
    ValueError points the caller at :func:`s2_cover_ranges`, whose output
    is bounded by construction (membership lists in the millions belong
    in range predicates, not Column.isin literals)."""
    ranges = s2_cover_ranges(qx0, qy0, qx1, qy1, level, max_cells)
    if len(ranges) == 0:
        return np.empty(0, dtype=np.int64)
    step = 1 << (2 * (S2_MAX_LEVEL - level) + 1)
    u = ranges.astype(np.uint64)
    total = int(((u[:, 1] - u[:, 0]) // np.uint64(step) + 1).sum())
    if total > max_cells:
        raise ValueError(
            f"exact level-{level} cover needs {total} cells "
            f"(> max_cells={max_cells}); use s2_cover_ranges() and prune "
            "with range predicates instead of isin membership")
    # NOTE: np.arange(start, stop) computes its length in float64 for
    # values near 2^60+ and silently drops the last id — build each
    # expansion as lo + step * arange(n) with the count from exact
    # integer math instead.
    out = np.concatenate([
        u[r, 0] + np.uint64(step) * np.arange(
            (int(u[r, 1]) - int(u[r, 0])) // step + 1, dtype=np.uint64)
        for r in range(len(u))]).astype(np.int64)
    return np.sort(out)


def udf_s2_cell(level: int = 16):
    """Arrow-vectorized (lon, lat) -> S2 cell id pandas UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def s2(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_id(lon.to_numpy(np.float64),
                                    lat.to_numpy(np.float64), level))
    return s2


def s2_token(cell_id: int) -> str:
    """Hex token: the id with trailing zero nibbles stripped."""
    h = f"{cell_id & ((1 << 64) - 1):016x}"
    return h.rstrip("0") or "X"
