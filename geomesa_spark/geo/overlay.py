"""General polygon overlay: intersection and difference for arbitrary
(concave, holed, multi-part) polygons.

Algorithm (classical boundary-walk overlay, re-derived — the reference
gets overlays from JTS, SpatialRelationFunctions.scala:57-59):

1. NODE the linework: split every boundary edge of A at every
   intersection with B's boundary (and vice versa), so no fragment
   properly crosses the other polygon's boundary. Each fragment's
   midpoint then classifies cleanly as Interior/Boundary/Exterior of the
   other polygon.
2. SELECT directed fragments (boundaries normalized shell-CCW/hole-CW,
   so the polygon interior is always LEFT of a directed edge):
     intersection(A, B): ∂A fragments with midpoint in Int(B); ∂B
       fragments with midpoint in Int(A); shared-boundary fragments once
       (from A) when both interiors lie on the fragment's left.
     difference(A, B): ∂A fragments with midpoint in Ext(B); REVERSED ∂B
       fragments with midpoint in Int(A); shared-boundary fragments once
       when A's interior is left and B's interior is not.
3. STITCH fragments into simple rings: at each node, continue with the
   outgoing fragment making the sharpest left turn (planar face
   traversal). Selection guarantees balanced in/out degrees.
4. ASSEMBLE rings: CCW rings are shells, CW rings are holes; each hole
   attaches to the smallest enclosing shell.

Nodes are quantized (1e-9 deg) so intersection points computed from the
A-split and the B-split coincide exactly.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from geomesa_spark.geo.model import (
    Geometry,
    GeometryCollection,
    MultiPolygon,
    Polygon,
    flatten,
)
from geomesa_spark.geo.predicates import (
    _seg_intersection,
    _segments,
    locate,
)

_Q = 1e-9  # node quantum, degrees


def _key(p) -> tuple[int, int]:
    return (int(round(p[0] / _Q)), int(round(p[1] / _Q)))


def _signed_area2(ring: np.ndarray) -> float:
    return float(np.dot(ring[:-1, 0], ring[1:, 1])
                 - np.dot(ring[1:, 0], ring[:-1, 1]))


def _oriented_rings(g: Geometry) -> list[np.ndarray]:
    """All boundary rings of the polygonal parts, normalized so the
    interior is LEFT of the direction of travel (shells CCW, holes CW)."""
    rings: list[np.ndarray] = []
    for part in flatten(g):
        if not isinstance(part, Polygon) or part.is_empty():
            continue
        shell = part.shell
        if _signed_area2(shell) < 0:
            shell = shell[::-1]
        rings.append(shell)
        for h in part.holes:
            hh = h if _signed_area2(h) < 0 else h[::-1]
            rings.append(hh)
    return rings


def _split_edges(rings: list[np.ndarray],
                 other_rings: list[np.ndarray]) -> list[tuple]:
    """Directed edge fragments of ``rings`` split at every intersection
    with ``other_rings``. Returns [(p, q)] with p, q float pairs."""
    other_segs = [(a, b) for r in other_rings for a, b in _segments(r)]
    frags: list[tuple] = []
    for r in rings:
        for s1, s2 in _segments(r):
            dx, dy = s2[0] - s1[0], s2[1] - s1[1]
            L2 = dx * dx + dy * dy
            if L2 == 0:
                continue
            ts = {0.0, 1.0}
            for b1, b2 in other_segs:
                kind, data = _seg_intersection(s1, s2, b1, b2)
                if kind == "point":
                    ts.add(((data[0] - s1[0]) * dx
                            + (data[1] - s1[1]) * dy) / L2)
                elif kind == "overlap":
                    for p in data:
                        ts.add(((p[0] - s1[0]) * dx
                                + (p[1] - s1[1]) * dy) / L2)
            tss = sorted(min(1.0, max(0.0, t)) for t in ts)
            for t0, t1 in zip(tss, tss[1:]):
                if t1 - t0 > 1e-12:
                    frags.append(((s1[0] + t0 * dx, s1[1] + t0 * dy),
                                  (s1[0] + t1 * dx, s1[1] + t1 * dy)))
    return frags


def _left_sample(p, q, eps: float = 1e-7):
    """A point slightly LEFT of directed segment p->q, at its midpoint."""
    mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
    dx, dy = q[0] - p[0], q[1] - p[1]
    n = math.hypot(dx, dy)
    if n == 0:
        return mx, my
    return mx - dy / n * eps, my + dx / n * eps


def _select_fragments(a: Geometry, b: Geometry, op: str) -> list[tuple]:
    """Directed fragments forming the boundary of op(a, b)."""
    ra = _oriented_rings(a)
    rb = _oriented_rings(b)
    frags_a = _split_edges(ra, rb)
    frags_b = _split_edges(rb, ra)
    out: list[tuple] = []
    for p, q in frags_a:
        mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
        lb = locate(b, mx, my)
        if lb == "B":
            # shared boundary: decide from the interiors just left of it
            lx, ly = _left_sample(p, q)
            in_a = locate(a, lx, ly) == "I"
            in_b = locate(b, lx, ly) == "I"
            keep = (in_a and in_b) if op == "intersection" \
                else (in_a and not in_b)
            if keep:
                out.append((p, q))
        elif (op == "intersection" and lb == "I") or \
                (op == "difference" and lb == "E"):
            out.append((p, q))
    for p, q in frags_b:
        mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
        # fragments on A's boundary (shared linework) were handled above
        if locate(a, mx, my) != "I":
            continue
        if op == "intersection":
            out.append((p, q))
        else:  # difference: B's boundary bounds the removed region,
            out.append((q, p))  # reversed so A-minus interior stays left
    return out


def _stitch_rings(frags: list[tuple]) -> list[np.ndarray]:
    """Assemble directed fragments into closed simple rings by always
    taking the sharpest-left outgoing fragment at each node."""
    by_start: dict[tuple, list[int]] = defaultdict(list)
    for i, (p, q) in enumerate(frags):
        if _key(p) != _key(q):
            by_start[_key(p)].append(i)
    used = [False] * len(frags)
    rings: list[np.ndarray] = []
    for start in range(len(frags)):
        if used[start] or _key(frags[start][0]) == _key(frags[start][1]):
            continue
        path = [start]
        used[start] = True
        while True:
            p, q = frags[path[-1]]
            if _key(q) == _key(frags[path[0]][0]):
                break  # closed
            cands = [i for i in by_start[_key(q)] if not used[i]]
            if not cands:
                path = None
                break
            # incoming direction reversed; pick the most-CCW candidate
            bx, by = p[0] - q[0], p[1] - q[1]
            base = math.atan2(by, bx)

            def turn(i):
                cp, cq = frags[i]
                ang = math.atan2(cq[1] - cp[1], cq[0] - cp[0])
                d = (ang - base) % (2 * math.pi)
                return d if d > 1e-12 else 2 * math.pi
            nxt = min(cands, key=turn)
            used[nxt] = True
            path.append(nxt)
        if not path:
            continue
        coords = [frags[i][0] for i in path] + [frags[path[0]][0]]
        ring = np.asarray(coords, dtype=np.float64)
        # drop collinear duplicates introduced by noding
        ring = _dedupe_ring(ring)
        if ring is not None and abs(_signed_area2(ring)) > 1e-18:
            rings.append(ring)
    return rings


def _dedupe_ring(ring: np.ndarray) -> np.ndarray | None:
    keep = [0]
    for i in range(1, len(ring) - 1):
        a = ring[keep[-1]]
        b = ring[i]
        c = ring[i + 1]
        if abs(b[0] - a[0]) < _Q and abs(b[1] - a[1]) < _Q:
            continue
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        la = math.hypot(b[0] - a[0], b[1] - a[1])
        lc = math.hypot(c[0] - b[0], c[1] - b[1])
        if la > 0 and lc > 0 and abs(cross) / (la * lc) < 1e-12 \
                and (c[0] - a[0]) * (b[0] - a[0]) \
                + (c[1] - a[1]) * (b[1] - a[1]) > 0:
            continue  # collinear continuation
        keep.append(i)
    out = np.vstack([ring[keep], ring[keep[:1]]])
    return out if len(out) >= 4 else None


def _assemble(rings: list[np.ndarray]) -> Geometry:
    """CCW rings -> shells, CW rings -> holes attached to the smallest
    enclosing shell."""
    if not rings:
        return GeometryCollection([])
    shells = [r for r in rings if _signed_area2(r) > 0]
    holes = [r for r in rings if _signed_area2(r) < 0]
    if not shells:
        return GeometryCollection([])
    polys: list[tuple[np.ndarray, list]] = [(s, []) for s in shells]
    areas = [abs(_signed_area2(s)) for s in shells]
    for h in holes:
        # representative interior point of the hole ring
        hx, hy = float(h[0, 0]), float(h[0, 1])
        cx, cy = h[:-1, 0].mean(), h[:-1, 1].mean()
        best, best_area = None, math.inf
        for i, (s, _) in enumerate(polys):
            if _ring_contains(s, cx, cy) or _ring_contains(s, hx, hy):
                if areas[i] < best_area:
                    best, best_area = i, areas[i]
        if best is not None:
            polys[best][1].append(h)
    out = [Polygon(s, hs) for s, hs in polys]
    return out[0] if len(out) == 1 else MultiPolygon(out)


def _ring_contains(ring: np.ndarray, x: float, y: float) -> bool:
    inside = False
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    spans = (ay > y) != (by > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ax + (y - ay) * (bx - ax) / (by - ay)
    return bool((spans & (xint > x)).sum() % 2)


def polygon_intersection(a: Geometry, b: Geometry) -> Geometry:
    """a ∩ b for arbitrary polygonal geometries (areal result; callers
    handle lower-dimensional touching separately)."""
    frags = _select_fragments(a, b, "intersection")
    return _assemble(_stitch_rings(frags))


def polygon_difference(a: Geometry, b: Geometry) -> Geometry:
    """a − b for arbitrary polygonal geometries."""
    frags = _select_fragments(a, b, "difference")
    return _assemble(_stitch_rings(frags))
