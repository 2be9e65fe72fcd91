"""Density (rasterization) aggregate — the reference's DensityScan as a
plain groupBy.

Semantics (/root/reference/geomesa-index-api/src/main/scala/org/locationtech/
geomesa/index/iterators/DensityScan.scala:32-113 + geomesa-utils GridSnap
.scala:19-50): snap each feature onto a width x height pixel grid over an
envelope, sum an optional weight per pixel, and emit (x, y, weight) at the
pixel *centers*. Point rendering only needs floor-binning; the whole
operator is JVM-side Catalyst expressions (a partial/final hash aggregate —
exactly the distributed shape of the reference's server-side iterators +
client merge, AggregatingScan.scala).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType


def density(df: DataFrame, *, envelope: tuple[float, float, float, float],
            width: int, height: int,
            lon: str = "lon", lat: str = "lat",
            weight: Column | str | None = None) -> DataFrame:
    """(col, row, x, y, weight) per non-empty pixel.

    GridSnap semantics: i = floor((v - min) / span * n), clamped into
    [0, n-1]; values outside the envelope are dropped (DensityScan renders
    only the query envelope).
    """
    x0, y0, x1, y1 = (float(v) for v in envelope)
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    w = F.lit(1.0) if weight is None else (
        F.col(weight) if isinstance(weight, str) else weight)
    col = F.least(F.floor((F.col(lon) - F.lit(x0)) / F.lit(dx)),
                  F.lit(width - 1)).cast("int")
    row = F.least(F.floor((F.col(lat) - F.lit(y0)) / F.lit(dy)),
                  F.lit(height - 1)).cast("int")
    return (df
            .where((F.col(lon) >= x0) & (F.col(lon) <= x1)
                   & (F.col(lat) >= y0) & (F.col(lat) <= y1))
            .groupBy(col.alias("col"), row.alias("row"))
            .agg(F.sum(w).alias("weight"))
            .select(
                "col", "row",
                (F.lit(x0) + (F.col("col") + 0.5) * F.lit(dx)).alias("x"),
                (F.lit(y0) + (F.col("row") + 0.5) * F.lit(dy)).alias("y"),
                "weight"))


# ------------------------------------------------- footprint rendering

def _bresenham(i0: int, j0: int, i1: int, j1: int) -> list[tuple[int, int]]:
    """Pixels on the line from (i0,j0) to (i1,j1) inclusive (the
    reference's GridSnap.bresenhamLine)."""
    out = []
    di, dj = abs(i1 - i0), abs(j1 - j0)
    si = 1 if i0 < i1 else -1
    sj = 1 if j0 < j1 else -1
    err = di - dj
    i, j = i0, j0
    while True:
        out.append((i, j))
        if i == i1 and j == j1:
            return out
        e2 = 2 * err
        if e2 > -dj:
            err -= dj
            i += si
        if e2 < di:
            err += di
            j += sj


def _scanline_fill(ii: np.ndarray, jj: np.ndarray) -> list[tuple[int, int]]:
    """Even-odd scanline fill of a pixel-snapped polygon ring, plus its
    Bresenham outline (RenderingGrid.render(Polygon): snap vertices to
    pixels, fill — we use even-odd at pixel centers where the reference
    uses AWT fillPolygon; boundary pixels come from the outline pass)."""
    pix: set[tuple[int, int]] = set()
    n = len(ii)
    for k in range(n - 1):
        pix.update(_bresenham(int(ii[k]), int(jj[k]),
                              int(ii[k + 1]), int(jj[k + 1])))
    jmin, jmax = int(jj.min()), int(jj.max())
    for j in range(jmin, jmax + 1):
        xs = []
        for k in range(n - 1):
            ja, jb = jj[k], jj[k + 1]
            if (ja > j) != (jb > j):
                t = (j - ja) / (jb - ja)
                xs.append(ii[k] + t * (ii[k + 1] - ii[k]))
        xs.sort()
        for a in range(0, len(xs) - 1, 2):
            for i in range(int(np.ceil(xs[a])), int(np.floor(xs[a + 1])) + 1):
                pix.add((i, j))
    return sorted(pix)


def density_footprint(df: DataFrame, *,
                      envelope: tuple[float, float, float, float],
                      width: int, height: int, geom: str = "geom",
                      weight: Column | str | None = None) -> DataFrame:
    """DensityScan for extended geometries: render each WKB line/polygon
    onto the pixel grid (Bresenham for lines, pixel-snapped scanline fill
    for polygons — RenderingGrid.scala:80-215 semantics), then aggregate
    weight per pixel. The rasterize step is an Arrow-batched pandas UDF
    emitting pixel codes; the aggregate is a plain JVM groupBy."""
    from geomesa_spark.geo import io as gio
    from geomesa_spark.geo.model import LineString, Point, Polygon, flatten

    x0, y0, x1, y1 = (float(v) for v in envelope)
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height

    def snap_i(x):
        return np.clip(np.floor((np.asarray(x) - x0) / dx), 0,
                       width - 1).astype(np.int64)

    def snap_j(y):
        return np.clip(np.floor((np.asarray(y) - y0) / dy), 0,
                       height - 1).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def pixels(wkb: pd.Series) -> pd.Series:
        memo: dict[bytes, list[int]] = {}
        out = []
        for v in wkb:
            if v is None:
                out.append([])
                continue
            key = bytes(v)
            if key not in memo:
                g = gio.from_wkb(key)
                pix: set[tuple[int, int]] = set()
                for part in flatten(g):
                    if isinstance(part, Point):
                        if not part.is_empty():
                            pix.add((int(snap_i(part.x)), int(snap_j(part.y))))
                    elif isinstance(part, LineString):
                        c = part.coords
                        ii, jj = snap_i(c[:, 0]), snap_j(c[:, 1])
                        last = None
                        for k in range(len(ii) - 1):
                            seg = _bresenham(int(ii[k]), int(jj[k]),
                                             int(ii[k + 1]), int(jj[k + 1]))
                            if last is not None and seg and seg[0] == last:
                                seg = seg[1:]  # don't double-count joints
                            pix.update(seg)
                            if seg:
                                last = seg[-1]
                    elif isinstance(part, Polygon) and not part.is_empty():
                        ring = part.rings()[0]
                        pix.update(_scanline_fill(snap_i(ring[:, 0]),
                                                  snap_j(ring[:, 1])))
                memo[key] = [int(i) * height + int(j) for (i, j) in pix]
            out.append(memo[key])
        return pd.Series(out)

    w = F.lit(1.0) if weight is None else (
        F.col(weight) if isinstance(weight, str) else weight)
    exploded = (df.withColumn("__px__", F.explode(pixels(F.col(geom))))
                .withColumn("__w__", w))
    return (exploded
            .groupBy((F.col("__px__") / height).cast("int").alias("col"),
                     F.pmod("__px__", F.lit(height)).cast("int").alias("row"))
            .agg(F.sum("__w__").alias("weight"))
            .select("col", "row",
                    (F.lit(x0) + (F.col("col") + 0.5) * F.lit(dx)).alias("x"),
                    (F.lit(y0) + (F.col("row") + 0.5) * F.lit(dy)).alias("y"),
                    "weight"))
