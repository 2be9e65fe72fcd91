"""Shapefile ingest without GDAL/pyshp (absent in this environment): a
pure-Python reader for the public ESRI shapefile spec (.shp geometry +
.dbf attributes), distributed via ``binaryFile`` + ``mapInPandas``.

Reference parity: the geomesa-convert shp module
(/root/reference/geomesa-convert/geomesa-convert-shp/*) ingests
shapefiles onto feature types. Scope: shape types Point (1), PolyLine
(3), Polygon (5) + their Null (0) placeholders; dBase III attribute
types C (string), N/F (numeric), L (logical), D (date-as-string).

Layout (public spec): .shp = 100-byte header (big-endian file code 9994
+ length; little-endian version 1000 + shape type + bbox), then records
of (big-endian record number + content words, little-endian shape).
.dbf = header (version, record count, header/record sizes, 32-byte field
descriptors), then fixed-width ASCII records flagged by a deletion byte.
Rows join .shp to .dbf by record index.
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_spark.geo import io as gio
from geomesa_spark.geo.model import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)


# ------------------------------------------------------------------- .shp

def read_shp(data: bytes) -> list:
    """Geometries (engine model objects; None for null shapes) in record
    order."""
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError("not a shapefile (.shp)")
    out = []
    p = 100
    n = len(data)
    while p + 8 <= n:
        _, words = struct.unpack(">ii", data[p:p + 8])
        p += 8
        content = data[p:p + words * 2]
        p += words * 2
        out.append(_parse_shape(content))
    return out


def _parse_shape(c: bytes):
    stype = struct.unpack("<i", c[:4])[0]
    if stype == 0:
        return None
    if stype == 1:  # Point
        x, y = struct.unpack("<dd", c[4:20])
        return Point(x, y)
    if stype in (3, 5):  # PolyLine / Polygon
        n_parts, n_points = struct.unpack("<ii", c[36:44])
        parts = struct.unpack(f"<{n_parts}i", c[44:44 + 4 * n_parts])
        pts = np.frombuffer(c, dtype="<f8",
                            count=2 * n_points,
                            offset=44 + 4 * n_parts).reshape(-1, 2)
        rings = [pts[parts[i]:(parts[i + 1] if i + 1 < n_parts
                               else n_points)]
                 for i in range(n_parts)]
        if stype == 3:
            lines = [LineString(r) for r in rings if len(r) >= 2]
            return lines[0] if len(lines) == 1 else MultiLineString(lines)
        # Polygon: rings are CW shells / CCW holes per spec; assign each
        # hole to the shell whose area contains its first vertex
        shells = [r for r in rings if _signed_area(r) < 0]  # CW = shell
        holes = [r for r in rings if _signed_area(r) >= 0]
        if not shells:  # degenerate: treat all as shells
            shells, holes = rings, []
        polys = [(s, []) for s in shells]
        for h in holes:
            x, y = float(h[0, 0]), float(h[0, 1])
            for s, hs in polys:
                if _ring_contains(s, x, y):
                    hs.append(h)
                    break
        geoms = [Polygon(s, hs) for s, hs in polys]
        return geoms[0] if len(geoms) == 1 else MultiPolygon(geoms)
    raise NotImplementedError(f"shape type {stype} (Point/PolyLine/"
                              f"Polygon supported)")


def _signed_area(ring: np.ndarray) -> float:
    return float(np.dot(ring[:-1, 0], ring[1:, 1])
                 - np.dot(ring[1:, 0], ring[:-1, 1]))


def _ring_contains(ring: np.ndarray, x: float, y: float) -> bool:
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    spans = (ay > y) != (by > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ax + (y - ay) * (bx - ax) / (by - ay)
    return bool((spans & (xint > x)).sum() % 2)


def write_shp(geoms: list) -> bytes:
    """Point/PolyLine/Polygon shapefile bytes (test/export sink)."""
    recs = []
    for i, g in enumerate(geoms):
        body = _encode_shape(g)
        recs.append(struct.pack(">ii", i + 1, len(body) // 2) + body)
    content = b"".join(recs)
    xs, ys = [], []
    for g in geoms:
        if g is not None and not g.is_empty():  # empty -> NaN bounds
            x0, y0, x1, y1 = g.bounds()
            xs += [x0, x1]
            ys += [y0, y1]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (0, 0, 0, 0)
    first = next((g for g in geoms if g is not None), None)
    stype = {Point: 1, LineString: 3, MultiLineString: 3,
             Polygon: 5, MultiPolygon: 5}.get(type(first), 0)
    # header: BE file code + 20 reserved bytes + BE length-in-words,
    # then LE version/shape-type/bbox(8 doubles) = 100 bytes total
    header = struct.pack(">i20xi", 9994, (100 + len(content)) // 2) \
        + struct.pack("<ii8d", 1000, stype, *bbox, 0.0, 0.0, 0.0, 0.0)
    return header + content


def _encode_shape(g) -> bytes:
    if g is None or g.is_empty():  # spec Null Shape (type 0) for empties too
        return struct.pack("<i", 0)
    if isinstance(g, Point):
        return struct.pack("<idd", 1, g.x, g.y)
    if isinstance(g, (LineString, MultiLineString)):
        rings = [g.coords] if isinstance(g, LineString) \
            else [p.coords for p in g.parts]
        return _encode_poly(3, rings)
    if isinstance(g, (Polygon, MultiPolygon)):
        rings = []
        for poly in ([g] if isinstance(g, Polygon) else g.parts):
            shell = poly.shell
            if _signed_area(shell) > 0:
                shell = shell[::-1]  # spec: shells CW
            rings.append(shell)
            for h in poly.holes:
                hh = h if _signed_area(h) > 0 else h[::-1]  # holes CCW
                rings.append(hh)
        return _encode_poly(5, rings)
    raise NotImplementedError(type(g).__name__)


def _encode_poly(stype: int, rings: list) -> bytes:
    rings = [r for r in rings if len(r)]  # empty part in a non-empty multi
    if not rings:
        return struct.pack("<i", 0)
    pts = np.vstack(rings)
    parts, off = [], 0
    for r in rings:
        parts.append(off)
        off += len(r)
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    return (struct.pack("<i4dii", stype, x0, y0, x1, y1,
                        len(rings), len(pts))
            + struct.pack(f"<{len(parts)}i", *parts)
            + pts.astype("<f8").tobytes())


# ------------------------------------------------------------------- .dbf

def read_dbf(data: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """(fields [(name, type)], records) from dBase III bytes."""
    n_rec, hdr_sz, rec_sz = struct.unpack("<ihh", data[4:12])
    fields = []
    p = 32
    while data[p] != 0x0D:
        name = data[p:p + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(data[p + 11])
        length = data[p + 16]
        fields.append((name, ftype, length))
        p += 32
    out = []
    p = hdr_sz
    for _ in range(n_rec):
        rec = data[p:p + rec_sz]
        p += rec_sz
        if rec[:1] == b"*":  # deleted
            out.append(None)
            continue
        row = {}
        q = 1
        for (name, ftype, length) in fields:
            raw = rec[q:q + length].decode("ascii", "replace").strip()
            q += length
            if ftype in ("N", "F"):
                row[name] = (float(raw) if raw and
                             ("." in raw or "e" in raw.lower())
                             else (int(raw) if raw else None))
            elif ftype == "L":
                row[name] = raw.upper() in ("T", "Y") if raw else None
            else:  # C, D
                row[name] = raw or None
        out.append(row)
    return [(n, t) for (n, t, _) in fields], out


def write_dbf(fields: list[tuple[str, str, int]],
              records: list[dict]) -> bytes:
    """dBase III bytes (test/export sink); fields = (name, C|N|F|L, len)."""
    import io
    buf = io.BytesIO()
    rec_sz = 1 + sum(ln for (_, _, ln) in fields)
    hdr_sz = 32 + 32 * len(fields) + 1
    buf.write(struct.pack("<4Bihh20x", 3, 24, 1, 1, len(records),
                          hdr_sz, rec_sz))
    for (name, ftype, ln) in fields:
        buf.write(name.encode("ascii").ljust(11, b"\0"))
        buf.write(ftype.encode("ascii"))
        buf.write(b"\0" * 4)
        buf.write(bytes([ln, 0]))
        buf.write(b"\0" * 14)
    buf.write(b"\x0d")
    for rec in records:
        buf.write(b" ")
        for (name, ftype, ln) in fields:
            v = rec.get(name)
            s = "" if v is None else (
                ("T" if v else "F") if ftype == "L" else str(v))
            b = s.encode("ascii", "replace")[:ln]
            buf.write(b.rjust(ln) if ftype in ("N", "F") else
                      b.ljust(ln))
    buf.write(b"\x1a")
    return buf.getvalue()


# ----------------------------------------------------------- spark bridge

def read_shapefile(spark, path: str):
    """Distributed shapefile read: binaryFile ships .shp/.dbf files; each
    parses in its own task emitting (stem, record index, wkb | attrs);
    geometry and attributes join on (stem, idx). Output: one row per
    feature with ``geom`` (WKB) + ``attrs_json`` (string map)."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.{shp,dbf}") \
        .load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pth, blob in zip(pdf["path"], pdf["content"]):
                stem = pth.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                if pth.endswith(".shp"):
                    geoms = read_shp(bytes(blob))
                    yield pd.DataFrame({
                        "stem": stem,
                        "idx": range(len(geoms)),
                        "geom": [None if g is None else gio.to_wkb(g)
                                 for g in geoms],
                        "attrs_json": None})
                elif pth.endswith(".dbf"):
                    _, recs = read_dbf(bytes(blob))
                    yield pd.DataFrame({
                        "stem": stem,
                        "idx": range(len(recs)),
                        "geom": None,
                        "attrs_json": [None if r is None
                                       else _json.dumps(r)
                                       for r in recs]})

    parsed = files.mapInPandas(
        parse, "stem string, idx long, geom binary, attrs_json string")
    # the self-join below consumes `parsed` twice; lazy lineage would
    # re-run the binaryFile scan + .shp/.dbf Python parse once per side
    # (same pattern as text/dedup.py's tokenization checkpoint)
    parsed = parsed.localCheckpoint(eager=False)
    g = parsed.where(F.col("geom").isNotNull()) \
        .select("stem", "idx", "geom")
    a = parsed.where(F.col("attrs_json").isNotNull()) \
        .select("stem", "idx", "attrs_json")
    return g.join(a, ["stem", "idx"], "left")
