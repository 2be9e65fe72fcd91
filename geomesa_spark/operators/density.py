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

from pyspark.sql import Column, DataFrame, functions as F


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
