"""Processing functions: antimeridian-safe splitting, geodesic point buffer,
CRS transform, DMS text, and limited overlay (intersection / difference).

Reference semantics re-implemented (cited, not copied):
- st_antimeridianSafeGeom / st_idlSafeGeom: per-vertex translation of
  out-of-range longitudes, then dateline split
  (GeometricProcessingFunctions.scala:41-56, alias :72).
- st_bufferPoint: distance meters -> degrees via the earth mean radius, then
  a 100-point planar circle, dateline-split (same file :33-39, :59-62).
- st_asLatLonText: DMS format with floor()-based degrees — including its
  behavior on negative coordinates (GeometricOutputFunctions.scala:50-64).
- st_transform: CRS reprojection (GeometricDistanceFunctions.scala:30-43);
  without proj we support the identity and EPSG:4326 <-> EPSG:3857.
"""

from __future__ import annotations

import math

import numpy as np

from geomesa_spark.geo.model import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    flatten,
)
from geomesa_spark.geo.measures import EARTH_MEAN_RADIUS_M, translate
from geomesa_spark.geo.predicates import (
    _seg_intersection,
    _segments,
    covered_by,
    disjoint,
    locate,
)

_WORLD = (-180.0, -90.0, 180.0, 90.0)


# ------------------------------------------------------------ half-plane clip

def _clip_ring_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland-Hodgman clip of a ring against half-plane a*x+b*y <= c."""
    out: list[tuple[float, float]] = []
    n = len(ring)
    for i in range(n - 1):
        p = (float(ring[i, 0]), float(ring[i, 1]))
        q = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
        pin = a * p[0] + b * p[1] <= c
        qin = a * q[0] + b * q[1] <= c
        if pin:
            out.append(p)
        if pin != qin:
            denom = a * (q[0] - p[0]) + b * (q[1] - p[1])
            t = (c - a * p[0] - b * p[1]) / denom
            out.append((p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])))
    if len(out) < 3:
        return np.empty((0, 2))
    out.append(out[0])
    return np.asarray(out)


def _is_convex(ring: np.ndarray) -> bool:
    v = np.diff(ring, axis=0)
    cross = v[:-1, 0] * v[1:, 1] - v[:-1, 1] * v[1:, 0]
    cross = np.append(cross, v[-1, 0] * v[0, 1] - v[-1, 1] * v[0, 0])
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def clip_polygon_convex(poly: Polygon, clipper: Polygon) -> Polygon | None:
    """poly ∩ clipper for a convex, hole-free clipper (S-H)."""
    ring = clipper.shell
    # orient clipper CCW so "inside" is a*x+b*y <= c with outward normals
    area2 = float(np.dot(ring[:-1, 0], ring[1:, 1]) - np.dot(ring[1:, 0], ring[:-1, 1]))
    if area2 < 0:
        ring = ring[::-1]
    shell = poly.shell
    for i in range(len(ring) - 1):
        ex, ey = ring[i + 1, 0] - ring[i, 0], ring[i + 1, 1] - ring[i, 1]
        # inside (left of edge): -ey*x + ex*y <= -ey*px + ex*py ... keep left
        a, b = ey, -ex
        c = a * ring[i, 0] + b * ring[i, 1]
        shell = _clip_ring_halfplane(shell, a, b, c)
        if len(shell) == 0:
            return None
    return Polygon(shell)  # holes of poly unsupported in this fast path


def _clip_line_to_box(coords: np.ndarray, box) -> list[np.ndarray]:
    x0, y0, x1, y1 = box
    pieces: list[list[tuple[float, float]]] = []
    cur: list[tuple[float, float]] = []
    for a, b in _segments(coords):
        seg = _clip_seg_box(a, b, box)
        if seg is None:
            if cur:
                pieces.append(cur)
                cur = []
            continue
        p, q = seg
        if cur and cur[-1] == p:
            cur.append(q)
        else:
            if cur:
                pieces.append(cur)
            cur = [p, q]
    if cur:
        pieces.append(cur)
    return [np.asarray(p) for p in pieces if len(p) >= 2]


def _clip_seg_box(p, q, box):
    """Liang-Barsky segment clip; returns (p', q') or None."""
    x0, y0, x1, y1 = box
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for pi, qi in ((-dx, p[0] - x0), (dx, x1 - p[0]), (-dy, p[1] - y0), (dy, y1 - p[1])):
        if pi == 0:
            if qi < 0:
                return None
            continue
        r = qi / pi
        if pi < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    if t0 > t1:
        return None
    return ((p[0] + t0 * dx, p[1] + t0 * dy), (p[0] + t1 * dx, p[1] + t1 * dy))


# ---------------------------------------------------------- antimeridian

def antimeridian_safe(g: Geometry) -> Geometry:
    """Translate out-of-range longitudes and split across the dateline."""
    x0, _, x1, _ = g.bounds()
    if not np.isfinite(x0) or (x0 >= -180.0 and x1 <= 180.0):
        return g
    world_poly = Polygon([[-180, -90], [180, -90], [180, 90], [-180, 90], [-180, -90]])
    pieces: list[Geometry] = []
    for shift in (0.0, -360.0, 360.0):
        for part in flatten(translate(g, shift, 0.0)):
            px0, _, px1, _ = part.bounds()
            if not np.isfinite(px0) or px1 < -180.0 or px0 > 180.0:
                continue
            if isinstance(part, Point):
                if -180.0 <= part.x <= 180.0:
                    pieces.append(part)
            elif isinstance(part, LineString):
                pieces.extend(LineString(c)
                              for c in _clip_line_to_box(part.coords, _WORLD))
            elif isinstance(part, Polygon):
                clipped = clip_polygon_convex(part, world_poly) \
                    if px0 < -180.0 or px1 > 180.0 else part
                if clipped is not None and not clipped.is_empty():
                    pieces.append(clipped)
    if len(pieces) == 1:
        return pieces[0]
    if all(isinstance(p, Polygon) for p in pieces):
        return MultiPolygon(pieces)
    if all(isinstance(p, LineString) for p in pieces):
        return MultiLineString(pieces)
    if all(isinstance(p, Point) for p in pieces):
        return MultiPoint(pieces)
    return GeometryCollection(pieces)


def buffer_point(p: Point, dist_m: float, n_points: int = 100) -> Geometry:
    """st_bufferPoint: meters -> degrees on the mean-radius sphere, 100-point
    circle, dateline-split."""
    deg = math.degrees(dist_m / EARTH_MEAN_RADIUS_M)
    ang = np.linspace(0.0, 2 * math.pi, n_points, endpoint=False)
    # latitude-corrected planar circle (spatial4j buffers in degrees; we keep
    # the circle round in surface distance by scaling lon by cos(lat))
    coslat = max(1e-12, math.cos(math.radians(p.y)))
    xs = p.x + deg * np.cos(ang) / coslat
    ys = p.y + deg * np.sin(ang)
    ys = np.clip(ys, -90.0, 90.0)
    ring = np.column_stack([xs, ys])
    ring = np.vstack([ring, ring[:1]])
    return antimeridian_safe(Polygon(ring))


# ------------------------------------------------------------- transform

_R_MAJOR = 6378137.0


def transform(g: Geometry, from_crs: str, to_crs: str) -> Geometry:
    """CRS reprojection (GeometricDistanceFunctions.scala:30-43 surface).

    Supported pairs: EPSG:4326 <-> EPSG:3857 (spherical web mercator) and
    EPSG:4326 <-> any WGS84 UTM zone (EPSG:326xx north / 327xx south,
    Krueger-series transverse Mercator, ~1 mm in-zone accuracy). Chains
    through 4326 for any supported-to-supported pair."""
    f = from_crs.upper().replace("EPSG:", "")
    t = to_crs.upper().replace("EPSG:", "")
    if f == t:
        return g
    return _from_4326(_to_4326(g, f, from_crs), t, to_crs)


def _to_4326(g: Geometry, code: str, label: str) -> Geometry:
    if code == "4326":
        return g
    if code == "3857":
        return _map_coords(g, _from_mercator)
    zone = _utm_zone(code)
    if zone is not None:
        return _map_coords(g, lambda c: _utm_inverse(c, *zone))
    raise NotImplementedError(
        f"st_transform supports EPSG:4326, EPSG:3857, and WGS84 UTM "
        f"zones (EPSG:326xx/327xx); got {label}")


def _from_4326(g: Geometry, code: str, label: str) -> Geometry:
    if code == "4326":
        return g
    if code == "3857":
        return _map_coords(g, _to_mercator)
    zone = _utm_zone(code)
    if zone is not None:
        return _map_coords(g, lambda c: _utm_forward(c, *zone))
    raise NotImplementedError(
        f"st_transform supports EPSG:4326, EPSG:3857, and WGS84 UTM "
        f"zones (EPSG:326xx/327xx); got {label}")


def _utm_zone(code: str) -> tuple[int, bool] | None:
    """(zone, south) for EPSG:326xx / 327xx WGS84 UTM codes."""
    if len(code) == 5 and code[:3] in ("326", "327"):
        z = int(code[3:])
        if 1 <= z <= 60:
            return z, code[:3] == "327"
    return None


# WGS84 transverse Mercator via the Krueger flattening series (order n^3,
# ~1 mm in-zone) — standard published formulas, re-derived constants.
_WGS_A = 6378137.0
_WGS_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_N = _WGS_F / (2.0 - _WGS_F)
_A_BAR = _WGS_A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)
_ALPHA = (_N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16,
          13 * _N ** 2 / 48 - 3 * _N ** 3 / 5,
          61 * _N ** 3 / 240)
_BETA = (_N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96,
         _N ** 2 / 48 + _N ** 3 / 15,
         17 * _N ** 3 / 480)
_DELTA = (2 * _N - 2 * _N ** 2 / 3 - 2 * _N ** 3,
          7 * _N ** 2 / 3 - 8 * _N ** 3 / 5,
          56 * _N ** 3 / 15)


def _utm_forward(c: np.ndarray, zone: int, south: bool) -> np.ndarray:
    lon0 = math.radians(-183.0 + 6.0 * zone)
    lam = np.radians(c[:, 0]) - lon0
    phi = np.radians(np.clip(c[:, 1], -89.9999, 89.9999))
    e2n = 2 * math.sqrt(_N) / (1 + _N)
    t = np.sinh(np.arctanh(np.sin(phi))
                - e2n * np.arctanh(e2n * np.sin(phi)))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = 500000.0 + _UTM_K0 * _A_BAR * x
    northing = _UTM_K0 * _A_BAR * y + (10000000.0 if south else 0.0)
    return np.column_stack([easting, northing])


def _utm_inverse(c: np.ndarray, zone: int, south: bool) -> np.ndarray:
    lon0 = math.radians(-183.0 + 6.0 * zone)
    x = (c[:, 0] - 500000.0) / (_UTM_K0 * _A_BAR)
    y = (c[:, 1] - (10000000.0 if south else 0.0)) / (_UTM_K0 * _A_BAR)
    xi, eta = y.copy(), x.copy()
    for j, b in enumerate(_BETA, start=1):
        xi -= b * np.sin(2 * j * y) * np.cosh(2 * j * x)
        eta -= b * np.cos(2 * j * y) * np.sinh(2 * j * x)
    chi = np.arcsin(np.sin(xi) / np.cosh(eta))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta), np.cos(xi))
    return np.column_stack([np.degrees(lam + lon0), np.degrees(phi)])


def _to_mercator(c: np.ndarray) -> np.ndarray:
    x = np.radians(c[:, 0]) * _R_MAJOR
    y = np.log(np.tan(np.pi / 4 + np.radians(np.clip(c[:, 1], -89.9999, 89.9999)) / 2)) * _R_MAJOR
    return np.column_stack([x, y])


def _from_mercator(c: np.ndarray) -> np.ndarray:
    lon = np.degrees(c[:, 0] / _R_MAJOR)
    lat = np.degrees(2 * np.arctan(np.exp(c[:, 1] / _R_MAJOR)) - np.pi / 2)
    return np.column_stack([lon, lat])


def _map_coords(g: Geometry, fn) -> Geometry:
    if isinstance(g, Point):
        out = fn(np.asarray([[g.x, g.y]]))
        return Point(out[0, 0], out[0, 1], g.m)
    if isinstance(g, LineString):
        return LineString(fn(g.coords))
    if isinstance(g, Polygon):
        return Polygon(fn(g.shell), [fn(h) for h in g.holes])
    return type(g)([_map_coords(p, fn) for p in g.parts])


# --------------------------------------------------------------- DMS text

def to_lat_lon_text(p: Point) -> str:
    """DMS string, floor()-based like the reference (including its negative-
    coordinate behavior)."""
    return f"{_dms(p.y, True)} {_dms(p.x, False)}"


def _dms(value: float, lat: bool) -> str:
    degrees = math.floor(value)
    decimal = value - degrees
    minutes = math.floor(decimal * 60)
    seconds = (decimal * 60 - minutes) * 60
    hemi = ("S" if degrees < 0 else "N") if lat else ("W" if degrees < 0 else "E")
    return f"{abs(degrees):.0f}°{minutes:.0f}'{seconds:.3f}\"{hemi}"


# ---------------------------------------------------------------- overlays

def intersection(a: Geometry, b: Geometry) -> Geometry:
    """Limited overlay: point/line vs any, polygon vs convex polygon.

    The reference gets general overlays from JTS (SpatialRelationFunctions
    .scala:57); this build supports the shapes our engine produces (points,
    boxes, convex covers) and raises for concave-concave polygon overlay.
    """
    da, db = a.dimension(), b.dimension()
    if da > db:
        return intersection(b, a)
    if a.is_empty() or b.is_empty() or disjoint(a, b):
        return GeometryCollection([])
    if da == 0:
        pts = [p for p in flatten(a) if isinstance(p, Point)
               and locate(b, p.x, p.y) != "E"]
        return pts[0] if len(pts) == 1 else MultiPoint(pts)
    if da == 1 and db >= 1:
        pieces: list[LineString] = []
        from geomesa_spark.geo.predicates import _linework, _split_samples
        mids, ipts, _ = _split_samples(_linework(a), _linework(b))
        # keep sub-segments of a whose midpoint is in b (closure)
        for la in _linework(a) if isinstance(a, (LineString, MultiLineString)) else []:
            for s1, s2 in _segments(la):
                subs = _subsegments(s1, s2, _linework(b))
                for p, q in subs:
                    m = ((p[0] + q[0]) / 2, (p[1] + q[1]) / 2)
                    if locate(b, m[0], m[1]) != "E":
                        pieces.append(LineString([p, q]))
        if pieces:
            merged = _merge_lines(pieces)
            return merged[0] if len(merged) == 1 else MultiLineString(merged)
        kept = [Point(*p) for p in ipts]
        return kept[0] if len(kept) == 1 else MultiPoint(kept)
    # polygon vs polygon: convex hole-free clipper -> Sutherland-Hodgman
    # fast path; anything else (concave x concave, holes, multi-part) ->
    # the general boundary-walk overlay (geo/overlay.py)
    pa = [p for p in flatten(a) if isinstance(p, Polygon)]
    pb = [p for p in flatten(b) if isinstance(p, Polygon)]
    simple = (len(pa) == 1 and len(pb) == 1
              and not pa[0].holes and not pb[0].holes)
    if simple and _is_convex(pb[0].shell):
        r = clip_polygon_convex(pa[0], pb[0])
        return r if r is not None else GeometryCollection([])
    if simple and _is_convex(pa[0].shell):
        r = clip_polygon_convex(pb[0], pa[0])
        return r if r is not None else GeometryCollection([])
    from geomesa_spark.geo.overlay import polygon_intersection
    ga = pa[0] if len(pa) == 1 else MultiPolygon(pa)
    gb = pb[0] if len(pb) == 1 else MultiPolygon(pb)
    return polygon_intersection(ga, gb)


def difference(a: Geometry, b: Geometry) -> Geometry:
    if a.is_empty() or b.is_empty() or disjoint(a, b):
        return a
    da = a.dimension()
    if da == 0:
        pts = [p for p in flatten(a) if isinstance(p, Point)
               and locate(b, p.x, p.y) == "E"]
        if not pts:
            return GeometryCollection([])
        return pts[0] if len(pts) == 1 else MultiPoint(pts)
    if da == 1:
        from geomesa_spark.geo.predicates import _linework
        pieces: list[LineString] = []
        for la in _linework(a):
            for s1, s2 in _segments(la):
                for p, q in _subsegments(s1, s2, _linework(b)):
                    m = ((p[0] + q[0]) / 2, (p[1] + q[1]) / 2)
                    if locate(b, m[0], m[1]) == "E":
                        pieces.append(LineString([p, q]))
        if not pieces:
            return GeometryCollection([])
        merged = _merge_lines(pieces)
        return merged[0] if len(merged) == 1 else MultiLineString(merged)
    if b.dimension() < 2:
        return a  # removing a lower-dimensional set leaves the area as-is
    if covered_by(a, b):
        return GeometryCollection([])
    from geomesa_spark.geo.overlay import polygon_difference
    pa = [p for p in flatten(a) if isinstance(p, Polygon)]
    pb = [p for p in flatten(b) if isinstance(p, Polygon)]
    ga = pa[0] if len(pa) == 1 else MultiPolygon(pa)
    gb = pb[0] if len(pb) == 1 else MultiPolygon(pb)
    return polygon_difference(ga, gb)


def _subsegments(s1, s2, lines_b) -> list[tuple[tuple, tuple]]:
    dx, dy = s2[0] - s1[0], s2[1] - s1[1]
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return []
    ts = {0.0, 1.0}
    for lb in lines_b:
        for b1, b2 in _segments(lb):
            kind, data = _seg_intersection(s1, s2, b1, b2)
            if kind == "point":
                ts.add(((data[0] - s1[0]) * dx + (data[1] - s1[1]) * dy) / L2)
            elif kind == "overlap":
                for p in data:
                    ts.add(((p[0] - s1[0]) * dx + (p[1] - s1[1]) * dy) / L2)
    tss = sorted(min(1.0, max(0.0, t)) for t in ts)
    out = []
    for t0, t1 in zip(tss, tss[1:]):
        if t1 > t0:
            out.append(((s1[0] + t0 * dx, s1[1] + t0 * dy),
                        (s1[0] + t1 * dx, s1[1] + t1 * dy)))
    return out


def _merge_lines(pieces: list[LineString]) -> list[LineString]:
    """Chain contiguous segments end-to-end."""
    chains: list[list[tuple]] = []
    for ls in pieces:
        p, q = tuple(ls.coords[0]), tuple(ls.coords[-1])
        for ch in chains:
            if ch[-1] == p:
                ch.append(q)
                break
            if ch[0] == q:
                ch.insert(0, p)
                break
        else:
            chains.append([p, q])
    return [LineString(np.asarray(ch)) for ch in chains]
