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
                if px0 < -180.0 or px1 > 180.0:
                    if part.holes:
                        # the convex fast path clips only the shell —
                        # silently re-including hole regions; holed
                        # parts take the general overlay instead
                        from geomesa_spark.geo.overlay import (
                            polygon_intersection,
                        )
                        clipped = polygon_intersection(part, world_poly)
                        pieces.extend(
                            p for p in flatten(clipped)
                            if isinstance(p, Polygon) and not p.is_empty())
                        continue
                    clipped = clip_polygon_convex(part, world_poly)
                else:
                    clipped = part
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

    Supported: EPSG:4326 <-> EPSG:3857 (spherical web mercator); any
    WGS84 UTM zone (EPSG:326xx north / 327xx south, Krueger-series
    transverse Mercator, ~1 mm in-zone accuracy); and every code in
    ``PROJ_REGISTRY`` — ellipsoidal Lambert Conformal Conic 2SP (e.g.
    EPSG:2154 Lambert-93, 3347/3978 Canada Lambert), Albers Equal Area
    (5070 Conus, 3577 Australian), and Polar Stereographic variant B
    (3031/3413/3995) — validated against Snyder's published numeric
    examples. Other codes: ``register_projection``. Chains through 4326
    for any supported-to-supported pair."""
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
    proj = _registry_projection(code)
    if proj is not None:
        return _map_coords(g, proj.inverse)
    raise NotImplementedError(
        f"st_transform supports EPSG:4326, EPSG:3857, WGS84 UTM zones "
        f"(EPSG:326xx/327xx), and the registered conic/polar codes "
        f"({sorted(PROJ_REGISTRY)}; extend via register_projection); "
        f"got {label}")


def _from_4326(g: Geometry, code: str, label: str) -> Geometry:
    if code == "4326":
        return g
    if code == "3857":
        return _map_coords(g, _to_mercator)
    zone = _utm_zone(code)
    if zone is not None:
        return _map_coords(g, lambda c: _utm_forward(c, *zone))
    proj = _registry_projection(code)
    if proj is not None:
        return _map_coords(g, proj.forward)
    raise NotImplementedError(
        f"st_transform supports EPSG:4326, EPSG:3857, WGS84 UTM zones "
        f"(EPSG:326xx/327xx), and the registered conic/polar codes "
        f"({sorted(PROJ_REGISTRY)}; extend via register_projection); "
        f"got {label}")


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


# ------------------------------------------- conic / polar projections
#
# Ellipsoidal Lambert Conformal Conic (2SP), Albers Equal Area, and
# Polar Stereographic (variant B) per the standard published formulas
# (Snyder, "Map Projections — A Working Manual", USGS PP 1395, ch. 15,
# 14 and 21). The reference reaches these through GeoTools' EPSG
# database (GeometricDistanceFunctions.scala:30-43); here a small
# registry carries the projection parameters for the common codes and
# ``register_projection`` accepts any others. Modern datums in the
# registry (RGF93 / NAD83 / GDA94) are treated as WGS84-coincident
# (sub-meter, the usual null transformation).

# (semi-major a, eccentricity^2)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 0.00669437999014132),
    "GRS80": (6378137.0, 0.00669438002290079),
    "CLARKE1866": (6378206.4, 0.00676865799729),
    "INTL1924": (6378388.0, 0.006722670022),
    # a = 6377563.396, 1/f = 299.3249646 -> e2 = 2f - f^2
    "AIRY1830": (6377563.396, 0.006670539761597337),
}


def _msnyder(phi: np.ndarray, e: float) -> np.ndarray:
    return np.cos(phi) / np.sqrt(1 - e * e * np.sin(phi) ** 2)


def _tsnyder(phi: np.ndarray, e: float) -> np.ndarray:
    es = e * np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)


def _phi_from_t(t: np.ndarray, e: float) -> np.ndarray:
    """Invert t(phi) by fixed point (Snyder 7-9); converges ~1e-12 rad."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es))
                                        ** (e / 2))
    return phi


def _qsnyder(phi: np.ndarray, e: float) -> np.ndarray:
    s = np.sin(phi)
    return (1 - e * e) * (s / (1 - e * e * s * s)
                          - (1 / (2 * e)) * np.log((1 - e * s)
                                                   / (1 + e * s)))


def _wrap_lon_deg(deg: np.ndarray) -> np.ndarray:
    return (deg + 180.0) % 360.0 - 180.0


class _Lcc2sp:
    """Lambert Conformal Conic, 2 standard parallels (Snyder 15-1..15-11,
    ellipsoidal)."""

    def __init__(self, a: float, e2: float, lat0: float, lon0: float,
                 sp1: float, sp2: float, fe: float, fn: float):
        self.a, self.e = a, math.sqrt(e2)
        self.lon0 = math.radians(lon0)
        self.fe, self.fn = fe, fn
        p1, p2 = math.radians(sp1), math.radians(sp2)
        p0 = math.radians(lat0)
        m1 = float(_msnyder(np.asarray([p1]), self.e)[0])
        m2 = float(_msnyder(np.asarray([p2]), self.e)[0])
        t1 = float(_tsnyder(np.asarray([p1]), self.e)[0])
        t2 = float(_tsnyder(np.asarray([p2]), self.e)[0])
        t0 = float(_tsnyder(np.asarray([p0]), self.e)[0])
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1)
                                                  - math.log(t2)) \
            if sp1 != sp2 else math.sin(p1)
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.F * t0 ** self.n

    def forward(self, c: np.ndarray) -> np.ndarray:
        lam = np.radians(c[:, 0]) - self.lon0
        lam = (lam + np.pi) % (2 * np.pi) - np.pi
        phi = np.radians(np.clip(c[:, 1], -89.999999, 89.999999))
        rho = self.a * self.F * _tsnyder(phi, self.e) ** self.n
        th = self.n * lam
        return np.column_stack([self.fe + rho * np.sin(th),
                                self.fn + self.rho0 - rho * np.cos(th)])

    def inverse(self, c: np.ndarray) -> np.ndarray:
        x = c[:, 0] - self.fe
        y = self.rho0 - (c[:, 1] - self.fn)
        rho = np.sign(self.n) * np.sqrt(x * x + y * y)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        t = (rho / (self.a * self.F)) ** (1 / self.n)
        phi = _phi_from_t(t, self.e)
        return np.column_stack([
            np.degrees(th / self.n + self.lon0), np.degrees(phi)])


class _Albers:
    """Albers Equal Area conic (Snyder 14-1..14-21, ellipsoidal)."""

    def __init__(self, a: float, e2: float, lat0: float, lon0: float,
                 sp1: float, sp2: float, fe: float, fn: float):
        self.a, self.e2, self.e = a, e2, math.sqrt(e2)
        self.lon0 = math.radians(lon0)
        self.fe, self.fn = fe, fn
        p1, p2 = math.radians(sp1), math.radians(sp2)
        p0 = math.radians(lat0)
        m1 = float(_msnyder(np.asarray([p1]), self.e)[0])
        m2 = float(_msnyder(np.asarray([p2]), self.e)[0])
        q1 = float(_qsnyder(np.asarray([p1]), self.e)[0])
        q2 = float(_qsnyder(np.asarray([p2]), self.e)[0])
        q0 = float(_qsnyder(np.asarray([p0]), self.e)[0])
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1) if sp1 != sp2 \
            else math.sin(p1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n

    def forward(self, c: np.ndarray) -> np.ndarray:
        lam = np.radians(c[:, 0]) - self.lon0
        lam = (lam + np.pi) % (2 * np.pi) - np.pi
        phi = np.radians(np.clip(c[:, 1], -90.0, 90.0))
        q = _qsnyder(phi, self.e)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * lam
        return np.column_stack([self.fe + rho * np.sin(th),
                                self.fn + self.rho0 - rho * np.cos(th)])

    def inverse(self, c: np.ndarray) -> np.ndarray:
        x = c[:, 0] - self.fe
        y = self.rho0 - (c[:, 1] - self.fn)
        rho = np.sqrt(x * x + y * y)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        # Snyder 3-16 iteration for phi from q
        phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))
        for _ in range(8):
            s = np.sin(phi)
            den = 1 - self.e2 * s * s
            phi = phi + den * den / (2 * np.cos(phi)) * (
                q / (1 - self.e2) - s / den
                + np.log((1 - self.e * s) / (1 + self.e * s))
                / (2 * self.e))
        return np.column_stack([
            _wrap_lon_deg(np.degrees(th / self.n + self.lon0)),
            np.degrees(phi)])


class _PolarStereoB:
    """Polar Stereographic variant B — standard parallel form (Snyder
    21-1..21-40, EPSG method 9829). ``latf`` < 0 selects the south
    aspect."""

    def __init__(self, a: float, e2: float, latf: float, lon0: float,
                 fe: float, fn: float):
        self.a, self.e = a, math.sqrt(e2)
        self.south = latf < 0
        self.lon0 = math.radians(lon0)
        self.fe, self.fn = fe, fn
        pf = math.radians(abs(latf))
        self.mf = float(_msnyder(np.asarray([pf]), self.e)[0])
        self.tf = float(_tsnyder(np.asarray([pf]), self.e)[0])

    def forward(self, c: np.ndarray) -> np.ndarray:
        lam = np.radians(c[:, 0]) - self.lon0
        phi = np.radians(np.clip(c[:, 1], -90.0, 90.0))
        if self.south:
            phi, lam = -phi, -lam
        t = _tsnyder(phi, self.e)
        rho = self.a * self.mf * t / self.tf
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return np.column_stack([self.fe + x, self.fn + y])

    def inverse(self, c: np.ndarray) -> np.ndarray:
        x = c[:, 0] - self.fe
        y = c[:, 1] - self.fn
        if self.south:
            x, y = -x, -y
        rho = np.sqrt(x * x + y * y)
        t = rho * self.tf / (self.a * self.mf)
        phi = _phi_from_t(t, self.e)
        lam = np.arctan2(x, -y)
        if self.south:
            phi, lam = -phi, -lam
        return np.column_stack([
            _wrap_lon_deg(np.degrees(lam + self.lon0)), np.degrees(phi)])


class _Tmerc:
    """General transverse Mercator (Krueger n-series, order n^3 — the
    same series as the WGS84 UTM fast path above, with per-instance
    ellipsoid constants): national grids with arbitrary origin / scale
    (British National Grid, NZTM, TM state planes)."""

    def __init__(self, a: float, e2: float, lat0: float, lon0: float,
                 k0: float, fe: float, fn: float):
        self.a, self.e2, self.e = a, e2, math.sqrt(e2)
        f = 1 - math.sqrt(1 - e2)
        n = f / (2.0 - f)
        self.n = n
        self.abar = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64)
        self.alpha = (n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16,
                      13 * n ** 2 / 48 - 3 * n ** 3 / 5,
                      61 * n ** 3 / 240)
        self.beta = (n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96,
                     n ** 2 / 48 + n ** 3 / 15,
                     17 * n ** 3 / 480)
        self.delta = (2 * n - 2 * n ** 2 / 3 - 2 * n ** 3,
                      7 * n ** 2 / 3 - 8 * n ** 3 / 5,
                      56 * n ** 3 / 15)
        self.k0, self.fe, self.fn = k0, fe, fn
        self.lon0 = math.radians(lon0)
        # meridian-arc northing of the latitude origin
        self.m0 = float(self._raw(np.asarray([[lon0, lat0]]))[0, 1])

    def _raw(self, c: np.ndarray) -> np.ndarray:
        lam = np.radians(c[:, 0]) - self.lon0
        lam = (lam + np.pi) % (2 * np.pi) - np.pi
        phi = np.radians(np.clip(c[:, 1], -89.9999, 89.9999))
        e2n = 2 * math.sqrt(self.n) / (1 + self.n)
        t = np.sinh(np.arctanh(np.sin(phi))
                    - e2n * np.arctanh(e2n * np.sin(phi)))
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
        x, y = eta.copy(), xi.copy()
        for j, aj in enumerate(self.alpha, start=1):
            x += aj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            y += aj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        return np.column_stack([self.k0 * self.abar * x,
                                self.k0 * self.abar * y])

    def forward(self, c: np.ndarray) -> np.ndarray:
        xy = self._raw(c)
        return np.column_stack([self.fe + xy[:, 0],
                                self.fn + xy[:, 1] - self.m0])

    def inverse(self, c: np.ndarray) -> np.ndarray:
        x = (c[:, 0] - self.fe) / (self.k0 * self.abar)
        y = (c[:, 1] - self.fn + self.m0) / (self.k0 * self.abar)
        xi, eta = y.copy(), x.copy()
        for j, bj in enumerate(self.beta, start=1):
            xi -= bj * np.sin(2 * j * y) * np.cosh(2 * j * x)
            eta -= bj * np.cos(2 * j * y) * np.sinh(2 * j * x)
        chi = np.arcsin(np.clip(np.sin(xi) / np.cosh(eta), -1.0, 1.0))
        phi = chi.copy()
        for j, dj in enumerate(self.delta, start=1):
            phi += dj * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta), np.cos(xi))
        return np.column_stack([
            _wrap_lon_deg(np.degrees(lam + self.lon0)), np.degrees(phi)])


class _DatumShifted:
    """Wrap a projection with a 7-parameter Helmert datum transformation
    (position-vector convention, h=0 two-dimensional use — the standard
    national-grid recipe). ``helmert`` maps WGS84 -> the projection
    datum: (tx, ty, tz meters, s ppm, rx, ry, rz arc-seconds)."""

    def __init__(self, proj, helmert: tuple, ellipsoid: tuple):
        self.proj = proj
        self.a_d, self.e2_d = ellipsoid
        tx, ty, tz, s_ppm, rx, ry, rz = helmert
        self.t = np.array([tx, ty, tz])
        self.s = s_ppm * 1e-6
        as_rad = math.pi / (180.0 * 3600.0)
        self.r = np.array([rx, ry, rz]) * as_rad
        self.a = getattr(proj, "a")
        self.e2 = getattr(proj, "e2", getattr(proj, "e") ** 2)

    @staticmethod
    def _to_ecef(c: np.ndarray, a: float, e2: float) -> np.ndarray:
        lam = np.radians(c[:, 0])
        phi = np.radians(c[:, 1])
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        return np.column_stack([nu * np.cos(phi) * np.cos(lam),
                                nu * np.cos(phi) * np.sin(lam),
                                nu * (1 - e2) * np.sin(phi)])

    @staticmethod
    def _from_ecef(xyz: np.ndarray, a: float, e2: float) -> np.ndarray:
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        p = np.hypot(x, y)
        phi = np.arctan2(z, p * (1 - e2))
        for _ in range(6):
            nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
            phi = np.arctan2(z + e2 * nu * np.sin(phi), p)
        lam = np.arctan2(y, x)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    def _helmert(self, xyz: np.ndarray, invert: bool) -> np.ndarray:
        s, r, t = self.s, self.r, self.t
        rot = np.array([[1 + s, -r[2], r[1]],
                        [r[2], 1 + s, -r[0]],
                        [-r[1], r[0], 1 + s]])
        if invert:
            return (xyz - t) @ np.linalg.inv(rot).T
        return xyz @ rot.T + t

    def forward(self, c: np.ndarray) -> np.ndarray:
        a_w, e2_w = ELLIPSOIDS["WGS84"]
        ecef = self._helmert(self._to_ecef(c, a_w, e2_w), invert=False)
        return self.proj.forward(self._from_ecef(ecef, self.a, self.e2))

    def inverse(self, c: np.ndarray) -> np.ndarray:
        a_w, e2_w = ELLIPSOIDS["WGS84"]
        geo_d = self.proj.inverse(c)
        ecef = self._helmert(self._to_ecef(geo_d, self.a, self.e2),
                             invert=True)
        return self._from_ecef(ecef, a_w, e2_w)


_PROJ_KINDS = {"lcc2sp": _Lcc2sp, "albers": _Albers,
               "ps_b": _PolarStereoB, "tmerc": _Tmerc}

# EPSG code -> (kind, ellipsoid, params). Parameters from the public
# EPSG definitions of each CRS.
PROJ_REGISTRY: dict[str, tuple[str, str, dict]] = {
    # RGF93 / Lambert-93 (France national grid)
    "2154": ("lcc2sp", "GRS80", dict(lat0=46.5, lon0=3.0, sp1=49.0,
                                     sp2=44.0, fe=700000.0,
                                     fn=6600000.0)),
    # NAD83 / Statistics Canada Lambert
    "3347": ("lcc2sp", "GRS80", dict(lat0=63.390675, lon0=-91.8666666667,
                                     sp1=49.0, sp2=77.0, fe=6200000.0,
                                     fn=3000000.0)),
    # NAD83 / Canada Atlas Lambert
    "3978": ("lcc2sp", "GRS80", dict(lat0=49.0, lon0=-95.0, sp1=49.0,
                                     sp2=77.0, fe=0.0, fn=0.0)),
    # NAD83 / Conus Albers
    "5070": ("albers", "GRS80", dict(lat0=23.0, lon0=-96.0, sp1=29.5,
                                     sp2=45.5, fe=0.0, fn=0.0)),
    # GDA94 / Australian Albers
    "3577": ("albers", "GRS80", dict(lat0=0.0, lon0=132.0, sp1=-18.0,
                                     sp2=-36.0, fe=0.0, fn=0.0)),
    # WGS 84 / Antarctic Polar Stereographic
    "3031": ("ps_b", "WGS84", dict(latf=-71.0, lon0=0.0, fe=0.0,
                                   fn=0.0)),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North
    "3413": ("ps_b", "WGS84", dict(latf=70.0, lon0=-45.0, fe=0.0,
                                   fn=0.0)),
    # WGS 84 / Arctic Polar Stereographic
    "3995": ("ps_b", "WGS84", dict(latf=71.0, lon0=0.0, fe=0.0, fn=0.0)),
    # OSGB36 / British National Grid (7-param Helmert from WGS84, the
    # OS-published parameters; ~1 m datum accuracy, OS guide sec 6.6)
    "27700": ("tmerc", "AIRY1830",
              dict(lat0=49.0, lon0=-2.0, k0=0.9996012717,
                   fe=400000.0, fn=-100000.0,
                   helmert=(-446.448, 125.157, -542.060, 20.4894,
                            -0.1502, -0.2470, -0.8421))),
    # NZGD2000 / New Zealand Transverse Mercator (datum ~WGS84)
    "2193": ("tmerc", "GRS80", dict(lat0=0.0, lon0=173.0, k0=0.9996,
                                    fe=1600000.0, fn=10000000.0)),
}

_PROJ_CACHE: dict[str, object] = {}


def register_projection(code: str, kind: str, ellipsoid: str,
                        params: dict) -> None:
    """Register an EPSG code for st_transform: ``kind`` one of
    ``lcc2sp`` (lat0 lon0 sp1 sp2 fe fn), ``albers`` (same), ``ps_b``
    (latf lon0 fe fn); ``ellipsoid`` a key of ``ELLIPSOIDS``."""
    if kind not in _PROJ_KINDS:
        raise ValueError(f"unknown projection kind {kind!r}")
    if ellipsoid not in ELLIPSOIDS:
        raise ValueError(f"unknown ellipsoid {ellipsoid!r}")
    PROJ_REGISTRY[str(code)] = (kind, ellipsoid, dict(params))
    _PROJ_CACHE.pop(str(code), None)


def _registry_projection(code: str):
    if code in _PROJ_CACHE:
        return _PROJ_CACHE[code]
    spec = PROJ_REGISTRY.get(code)
    if spec is None:
        return None
    kind, ell, params = spec
    params = dict(params)
    helmert = params.pop("helmert", None)
    a, e2 = ELLIPSOIDS[ell]
    proj = _PROJ_KINDS[kind](a, e2, **params)
    if helmert is not None:
        proj = _DatumShifted(proj, helmert, (a, e2))
    _PROJ_CACHE[code] = proj
    return proj


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
        # da == 1 guarantees no polygon parts, so _linework(a) is exactly
        # a's line chains — iterate it unconditionally (the previous
        # isinstance(LineString/MultiLineString) guard silently dropped
        # the linework of a dim-1 GeometryCollection)
        lines_a = _linework(a)
        lines_b = _linework(b)
        # keep sub-segments of a whose midpoint is in b (closure)
        for la in lines_a:
            for s1, s2 in _segments(la):
                for p, q in _subsegments(s1, s2, lines_b):
                    m = ((p[0] + q[0]) / 2, (p[1] + q[1]) / 2)
                    if locate(b, m[0], m[1]) != "E":
                        pieces.append(LineString([p, q]))
        if pieces:
            merged = _merge_lines(pieces)
            return merged[0] if len(merged) == 1 else MultiLineString(merged)
        # no 1D overlap: the intersection is the crossing/touch points —
        # only now pay for the noding pass (it duplicates _subsegments'
        # O(n*m) work, so it must not run on the common overlap path)
        _, ipts, _ = _split_samples(lines_a, lines_b)
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
