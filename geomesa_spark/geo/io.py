"""WKB / WKT / GeoJSON serialization.

WKB is the interchange format throughout the engine, mirroring the
reference's WKB-encoded geometry UDTs (AbstractGeometryUDT.scala:29-42,
WKBUtils). We write little-endian ISO WKB; the reader accepts both byte
orders, Z/M/ZM variants (ISO +1000/+2000/+3000 and EWKB flag bits —
extra ordinates beyond XY+M are ignored), and nested multis/collections.

``points_from_wkb`` is the vectorized hot path: when every value in a batch
is a plain little-endian 2D point (21 bytes) the batch is decoded with one
``np.frombuffer`` — zero per-row Python, per the engine's input contract.
"""

from __future__ import annotations

import json
import struct

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
)

_WKB_TYPES = {
    "Point": 1, "LineString": 2, "Polygon": 3,
    "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


# ---------------------------------------------------------------- WKB write

def to_wkb(g: Geometry | None) -> bytes | None:
    if g is None:
        return None
    buf = bytearray()
    _write_geom(buf, g)
    return bytes(buf)


def _write_geom(buf: bytearray, g: Geometry) -> None:
    buf.append(1)  # little-endian
    code = _WKB_TYPES[g.typ]
    if isinstance(g, Point):
        if g.m is not None:
            buf += struct.pack("<I", code + 2000)  # ISO PointM
            buf += struct.pack("<ddd", g.x, g.y, g.m)
        else:
            buf += struct.pack("<I", code)
            buf += struct.pack("<dd", g.x, g.y)
        return
    buf += struct.pack("<I", code)
    if isinstance(g, LineString):
        _write_coords(buf, g.coords)
    elif isinstance(g, Polygon):
        rings = g.rings()
        buf += struct.pack("<I", len(rings))
        for r in rings:
            _write_coords(buf, r)
    else:  # multi / collection
        buf += struct.pack("<I", len(g.parts))
        for p in g.parts:
            _write_geom(buf, p)


def _write_coords(buf: bytearray, coords: np.ndarray) -> None:
    buf += struct.pack("<I", len(coords))
    buf += np.ascontiguousarray(coords, dtype="<f8").tobytes()


# ----------------------------------------------------------------- WKB read

def from_wkb(b: bytes | bytearray | memoryview | None) -> Geometry | None:
    if b is None:
        return None
    g, _ = _read_geom(memoryview(bytes(b)), 0)
    return g


def _read_geom(mv: memoryview, off: int) -> tuple[Geometry, int]:
    little = mv[off] == 1
    bo = "<" if little else ">"
    (raw,) = struct.unpack_from(bo + "I", mv, off + 1)
    off += 5
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    has_srid = bool(raw & _EWKB_SRID)
    code = raw & 0x0FFFFFFF
    if code >= 1000:  # ISO: +1000 Z, +2000 M, +3000 ZM
        iso = code // 1000
        has_z = has_z or iso in (1, 3)
        has_m = has_m or iso in (2, 3)
        code = code % 1000
    if has_srid:
        off += 4
    ndim = 2 + has_z + has_m

    def read_pts(n: int, o: int) -> tuple[np.ndarray, np.ndarray | None, int]:
        nbytes = n * ndim * 8
        arr = np.frombuffer(mv, dtype=bo + "f8", count=n * ndim, offset=o)
        arr = arr.reshape(n, ndim)
        m = arr[:, 2 + has_z] if has_m else None
        return arr[:, :2].astype(np.float64), m, o + nbytes

    if code == 1:
        pts, m, off = read_pts(1, off)
        mm = float(m[0]) if m is not None else None
        return Point(pts[0, 0], pts[0, 1], mm), off
    if code == 2:
        (n,) = struct.unpack_from(bo + "I", mv, off)
        pts, _, off = read_pts(n, off + 4)
        return LineString(pts), off
    if code == 3:
        (nr,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            pts, _, off = read_pts(n, off + 4)
            rings.append(pts)
        return Polygon(rings[0], rings[1:]) if rings else Polygon(np.empty((0, 2))), off
    if code in (4, 5, 6, 7):
        (np_,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        parts = []
        for _ in range(np_):
            p, off = _read_geom(mv, off)
            parts.append(p)
        cls = {4: MultiPoint, 5: MultiLineString, 6: MultiPolygon,
               7: GeometryCollection}[code]
        return cls(parts), off
    raise ValueError(f"unsupported WKB type code {raw}")


# ------------------------------------------------- vectorized point batches

def points_from_wkb(values) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of WKB values to (x, y) float64 arrays.

    Fast path: all values are 21-byte little-endian 2D points -> one
    frombuffer. None/invalid rows yield NaN.
    """
    vals = list(values)
    n = len(vals)
    ok = all(v is not None and len(v) == 21 and v[0] == 1 for v in vals)
    if ok and n:
        blob = b"".join(vals)
        arr = np.frombuffer(blob, dtype=np.uint8).reshape(n, 21)
        # type codes must all be 1 (point)
        codes = arr[:, 1:5].copy().view("<u4").ravel()
        if np.all(codes == 1):
            xy = arr[:, 5:21].copy().view("<f8").reshape(n, 2)
            return xy[:, 0].copy(), xy[:, 1].copy()
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    for i, v in enumerate(vals):
        if v is None:
            continue
        g = from_wkb(v)
        if isinstance(g, Point):
            x[i], y[i] = g.x, g.y
    return x, y


def points_to_wkb(x, y) -> list[bytes | None]:
    """Encode (x, y) arrays to a list of 21-byte WKB points (NaN -> None)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    out = np.empty((n, 21), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    out[:, 5:13] = x.astype("<f8").view(np.uint8).reshape(n, 8)
    out[:, 13:21] = y.astype("<f8").view(np.uint8).reshape(n, 8)
    bad = ~(np.isfinite(x) & np.isfinite(y))
    blobs = out.tobytes()
    return [None if bad[i] else blobs[i * 21:(i + 1) * 21] for i in range(n)]


# ----------------------------------------------------------------- WKT

def to_wkt(g: Geometry | None) -> str | None:
    if g is None:
        return None
    if g.is_empty():
        return f"{g.typ.upper()} EMPTY"
    t = g.typ.upper()
    if isinstance(g, Point):
        return f"POINT ({_fmt(g.x)} {_fmt(g.y)})"
    if isinstance(g, LineString):
        return f"LINESTRING {_coords_wkt(g.coords)}"
    if isinstance(g, Polygon):
        return f"POLYGON {_rings_wkt(g.rings())}"
    if isinstance(g, MultiPoint):
        inner = ", ".join("EMPTY" if p.is_empty()
                          else f"({_fmt(p.x)} {_fmt(p.y)})" for p in g.parts)
        return f"MULTIPOINT ({inner})"
    if isinstance(g, MultiLineString):
        inner = ", ".join("EMPTY" if p.is_empty()
                          else _coords_wkt(p.coords) for p in g.parts)
        return f"MULTILINESTRING ({inner})"
    if isinstance(g, MultiPolygon):
        inner = ", ".join("EMPTY" if p.is_empty()
                          else _rings_wkt(p.rings()) for p in g.parts)
        return f"MULTIPOLYGON ({inner})"
    inner = ", ".join(to_wkt(p) for p in g.parts)
    return f"{t} ({inner})"


def _fmt(v: float) -> str:
    return repr(int(v)) if float(v).is_integer() and abs(v) < 1e15 else repr(float(v))


def _coords_wkt(c: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c) + ")"


def _rings_wkt(rings) -> str:
    return "(" + ", ".join(_coords_wkt(r) for r in rings) + ")"


def from_wkt(s: str | None) -> Geometry | None:
    if s is None:
        return None
    s = s.strip()
    typ, dim, rest = _split_type(s)
    if rest.upper().startswith("EMPTY"):
        return {"POINT": Point(), "LINESTRING": LineString(np.empty((0, 2))),
                "POLYGON": Polygon(np.empty((0, 2))),
                "MULTIPOINT": MultiPoint([]), "MULTILINESTRING": MultiLineString([]),
                "MULTIPOLYGON": MultiPolygon([]),
                "GEOMETRYCOLLECTION": GeometryCollection([])}[typ]
    body = rest.strip()
    if typ == "POINT":
        vals = _parse_pos_list(_strip_parens(body))
        p = vals[0]
        # M is the LAST ordinate only when the dim token says so ("M",
        # "ZM") or four bare ordinates imply XYZM; a bare third ordinate
        # is Z (JTS WKTReader convention), which this model drops
        if dim == "M" and len(p) > 2:
            m = p[2]
        elif (dim == "ZM" or (dim == "" and len(p) > 3)) and len(p) > 3:
            m = p[3]
        else:
            m = None
        return Point(p[0], p[1], m)
    if typ == "LINESTRING":
        return LineString([v[:2] for v in _parse_pos_list(_strip_parens(body))])
    if typ == "POLYGON":
        return Polygon(*_parse_rings(body))
    if typ == "MULTIPOINT":
        inner = _strip_parens(body)
        groups = _split_top(inner)
        pts = []
        for gtxt in groups:
            gtxt = gtxt.strip()
            if gtxt.upper() == "EMPTY":  # JTS: EMPTY element allowed
                pts.append(Point())
                continue
            if gtxt.startswith("("):
                gtxt = _strip_parens(gtxt)
            v = _parse_pos_list(gtxt)[0]
            pts.append(Point(v[0], v[1]))
        return MultiPoint(pts)
    if typ == "MULTILINESTRING":
        inner = _strip_parens(body)
        return MultiLineString(
            [LineString(np.empty((0, 2))) if t.strip().upper() == "EMPTY"
             else LineString([v[:2]
                              for v in _parse_pos_list(_strip_parens(t.strip()))])
             for t in _split_top(inner)])
    if typ == "MULTIPOLYGON":
        inner = _strip_parens(body)
        return MultiPolygon([Polygon(np.empty((0, 2)))
                             if t.strip().upper() == "EMPTY"
                             else Polygon(*_parse_rings(t.strip()))
                             for t in _split_top(inner)])
    if typ == "GEOMETRYCOLLECTION":
        inner = _strip_parens(body)
        return GeometryCollection([from_wkt(t.strip()) for t in _split_top(inner)])
    raise ValueError(f"unsupported WKT type {typ}")


def _split_type(s: str) -> tuple[str, str, str]:
    """(TYPE, dimension token "" | "Z" | "M" | "ZM", remainder)."""
    i = 0
    while i < len(s) and (s[i].isalpha()):
        i += 1
    typ = s[:i].upper()
    rest = s[i:].strip()
    dim = ""
    for tok in ("ZM", "Z", "M"):
        if rest.upper().startswith(tok + " ") or rest.upper().startswith(tok + "("):
            dim = tok
            rest = rest[len(tok):].strip()
            break
    return typ, dim, rest


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not s.startswith("("):
        return s
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i]
    raise ValueError(f"unbalanced parens in WKT: {s[:60]}")


def _split_top(s: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def _parse_pos_list(s: str) -> list[list[float]]:
    return [[float(t) for t in part.split()] for part in s.split(",") if part.strip()]


def _parse_rings(body: str):
    inner = _strip_parens(body)
    rings = [[v[:2] for v in _parse_pos_list(_strip_parens(t.strip()))]
             for t in _split_top(inner)]
    return rings[0], rings[1:]


# ----------------------------------------------------------------- GeoJSON

def to_geojson(g: Geometry | None) -> str | None:
    """GeoJSON geometry (CRS not encoded, like st_asGeoJSON,
    GeometricOutputFunctions.scala:29)."""
    if g is None:
        return None
    return json.dumps(_gj(g), separators=(",", ":"))


def _gj(g: Geometry):
    if g.is_empty() and not isinstance(g, GeometryCollection):
        # JTS GeoJsonWriter: empty -> "coordinates": [] (json has no NaN)
        return {"type": g.typ, "coordinates": []}
    if isinstance(g, Point):
        return {"type": "Point", "coordinates": [g.x, g.y]}
    if isinstance(g, LineString):
        return {"type": "LineString", "coordinates": g.coords.tolist()}
    if isinstance(g, Polygon):
        return {"type": "Polygon", "coordinates": [r.tolist() for r in g.rings()]}
    if isinstance(g, MultiPoint):
        return {"type": "MultiPoint", "coordinates": [[p.x, p.y] for p in g.parts]}
    if isinstance(g, MultiLineString):
        return {"type": "MultiLineString",
                "coordinates": [p.coords.tolist() for p in g.parts]}
    if isinstance(g, MultiPolygon):
        return {"type": "MultiPolygon",
                "coordinates": [[r.tolist() for r in p.rings()] for p in g.parts]}
    return {"type": "GeometryCollection", "geometries": [_gj(p) for p in g.parts]}


def from_geojson(s: str | None) -> Geometry | None:
    if s is None:
        return None
    o = json.loads(s)
    if o.get("type") == "Feature":
        o = o["geometry"]
    return _from_gj(o)


def _from_gj(o) -> Geometry:
    t = o["type"]
    c = o.get("coordinates")
    if t != "GeometryCollection" and not c:  # "coordinates": [] = EMPTY
        return {"Point": Point(), "LineString": LineString(np.empty((0, 2))),
                "Polygon": Polygon(np.empty((0, 2))),
                "MultiPoint": MultiPoint([]),
                "MultiLineString": MultiLineString([]),
                "MultiPolygon": MultiPolygon([])}[t]
    if t == "Point":
        return Point(c[0], c[1])
    if t == "LineString":
        return LineString(c)
    if t == "Polygon":
        return Polygon(c[0], c[1:])
    if t == "MultiPoint":
        return MultiPoint([Point(p[0], p[1]) for p in c])
    if t == "MultiLineString":
        return MultiLineString([LineString(p) for p in c])
    if t == "MultiPolygon":
        return MultiPolygon([Polygon(p[0], p[1:]) for p in c])
    if t == "GeometryCollection":
        return GeometryCollection([_from_gj(p) for p in o["geometries"]])
    raise ValueError(f"unsupported GeoJSON type {t}")
