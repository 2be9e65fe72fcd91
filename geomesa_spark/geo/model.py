"""Lightweight geometry object model (OGC Simple Features, XY + optional M).

The reference carries JTS geometries through Catalyst as WKB-encoded UDTs
(/root/reference/geomesa-spark/geomesa-spark-jts/src/main/scala/org/apache/
spark/sql/jts/AbstractGeometryUDT.scala:29-42); we carry plain WKB binary
columns and materialize these objects only inside Arrow-batch UDF kernels.

Coordinates are numpy float64 arrays shaped (N, 2) (an optional parallel
``m`` array for measured points). Everything is immutable by convention.
"""

from __future__ import annotations

import numpy as np


class Geometry:
    """Base class; concrete types below."""

    typ: str = "Geometry"

    def bounds(self) -> tuple[float, float, float, float]:
        raise NotImplementedError

    def is_empty(self) -> bool:
        raise NotImplementedError

    def dimension(self) -> int:
        """Topological dimension: 0 points, 1 lines, 2 areas."""
        raise NotImplementedError

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        from geomesa_spark.geo.io import to_wkt
        return to_wkt(self)

    def __eq__(self, other) -> bool:
        from geomesa_spark.geo.io import to_wkb
        return isinstance(other, Geometry) and to_wkb(self) == to_wkb(other)

    def __hash__(self) -> int:
        from geomesa_spark.geo.io import to_wkb
        return hash(to_wkb(self))


class Point(Geometry):
    typ = "Point"

    def __init__(self, x: float = np.nan, y: float = np.nan, m: float | None = None):
        self.x = float(x)
        self.y = float(y)
        self.m = m  # measure value for PointM (st_makePointM)

    def is_empty(self) -> bool:
        return not (np.isfinite(self.x) and np.isfinite(self.y))

    def bounds(self):
        return (self.x, self.y, self.x, self.y)

    def dimension(self) -> int:
        return 0


class LineString(Geometry):
    typ = "LineString"

    def __init__(self, coords):
        self.coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)

    def is_empty(self) -> bool:
        return len(self.coords) == 0

    def bounds(self):
        c = self.coords
        if not len(c):  # match Point/_Multi: empty -> NaN envelope, no raise
            return (np.nan,) * 4
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    def dimension(self) -> int:
        return 1

    def is_closed(self) -> bool:
        return len(self.coords) >= 2 and bool(np.all(self.coords[0] == self.coords[-1]))

    def is_ring(self) -> bool:
        return self.is_closed() and len(self.coords) >= 4


class Polygon(Geometry):
    """Shell + holes; rings are (N,2) arrays, closed (first == last)."""

    typ = "Polygon"

    def __init__(self, shell, holes=()):
        self.shell = _close_ring(np.asarray(shell, dtype=np.float64).reshape(-1, 2))
        self.holes = [_close_ring(np.asarray(h, dtype=np.float64).reshape(-1, 2))
                      for h in holes]

    def rings(self):
        return [self.shell, *self.holes]

    def is_empty(self) -> bool:
        return len(self.shell) == 0

    def bounds(self):
        c = self.shell
        if not len(c):  # match Point/_Multi: empty -> NaN envelope, no raise
            return (np.nan,) * 4
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    def dimension(self) -> int:
        return 2

    def exterior(self) -> LineString:
        return LineString(self.shell)


class _Multi(Geometry):
    part_type: type = Geometry

    def __init__(self, parts):
        self.parts = list(parts)

    def is_empty(self) -> bool:
        return all(p.is_empty() for p in self.parts)

    def bounds(self):
        bs = [p.bounds() for p in self.parts if not p.is_empty()]
        if not bs:
            return (np.nan,) * 4
        arr = np.asarray(bs)
        return (arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max())


class MultiPoint(_Multi):
    typ = "MultiPoint"
    part_type = Point

    def dimension(self) -> int:
        return 0


class MultiLineString(_Multi):
    typ = "MultiLineString"
    part_type = LineString

    def dimension(self) -> int:
        return 1

    def is_closed(self) -> bool:
        # JTS MultiLineString.isClosed: false when empty, else every part
        # closed (st_isClosed/st_isRing dispatch on this,
        # GeometricAccessorFunctions.scala:46-57)
        return bool(self.parts) and all(p.is_closed() for p in self.parts)


class MultiPolygon(_Multi):
    typ = "MultiPolygon"
    part_type = Polygon

    def dimension(self) -> int:
        return 2


class GeometryCollection(_Multi):
    typ = "GeometryCollection"

    def dimension(self) -> int:
        return max((p.dimension() for p in self.parts if not p.is_empty()), default=0)


def _close_ring(c: np.ndarray) -> np.ndarray:
    if len(c) >= 3 and not np.all(c[0] == c[-1]):
        return np.vstack([c, c[:1]])
    return c


def flatten(g: Geometry) -> list[Geometry]:
    """Recursively expand multi/collection into primitive parts."""
    if isinstance(g, _Multi):
        out: list[Geometry] = []
        for p in g.parts:
            out.extend(flatten(p))
        return out
    return [g]


def num_geometries(g: Geometry) -> int:
    return len(g.parts) if isinstance(g, _Multi) else 1


def geometry_n(g: Geometry, n: int) -> Geometry:
    """1-based, as in the reference's st_geometryN
    (GeometricAccessorFunctions.scala:31)."""
    if n < 1:  # guard Python negative indexing: parts[0-1] is the LAST part
        raise IndexError(n)
    if isinstance(g, _Multi):
        return g.parts[n - 1]
    if n == 1:
        return g
    raise IndexError(n)
