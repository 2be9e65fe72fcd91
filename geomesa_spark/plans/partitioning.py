"""Spatial partitioning strategies for co-located joins.

The reference's four strategies (/root/reference/geomesa-spark/
geomesa-spark-sql/src/main/scala/org/locationtech/geomesa/spark/
RelationUtils.scala — equal :85-105, earth :131-133, weighted :107-129,
rtree :137-204; routed by IndexPartitioner with a reserved last partition
for misses :18-29) re-expressed as partition-id column assignments the
DataFrame can ``repartition`` on. ``rtree`` packs leaf envelopes from a
driver-side sample with Sort-Tile-Recursive ordering (the algorithm
underlying the reference's STRtree leaves) and compiles them to a native
CASE expression.

Reserved-partition semantics: rows with no computable position (or, for
rtree, outside every sampled envelope) get id -1 and are kept, never
dropped."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from geomesa_spark.cells.native import cell_expr


def equal_partition_id(df: DataFrame, *, lon: str = "lon",
                       lat: str = "lat", parallelism: int = 16) -> Column:
    """sqrt(n) x sqrt(n) grid over the DATA bounds (equalPartitioning):
    bounds come from one aggregate over the frame."""
    import math
    n = max(int(math.isqrt(parallelism)), 1)
    b = df.agg(F.min(lon), F.max(lon), F.min(lat), F.max(lat)).collect()[0]
    x0, x1, y0, y1 = (float(b[0]), float(b[1]), float(b[2]), float(b[3]))
    dx = max((x1 - x0) / n, 1e-12)
    dy = max((y1 - y0) / n, 1e-12)
    i = F.least(F.floor((F.col(lon) - x0) / dx), F.lit(n - 1)).cast("int")
    j = F.least(F.floor((F.col(lat) - y0) / dy), F.lit(n - 1)).cast("int")
    ok = F.col(lon).isNotNull() & F.col(lat).isNotNull()
    return F.when(ok, i * n + j).otherwise(F.lit(-1))


def earth_partition_id(*, lon: str = "lon", lat: str = "lat",
                       res: int = 4) -> Column:
    """Fixed whole-earth grid (earth strategy) = the Z2 cell itself."""
    return cell_expr(lon, lat, res)


def weighted_partition_id(df: DataFrame, *, lon: str = "lon",
                          lat: str = "lat", parallelism: int = 16,
                          sample: float = 0.1) -> Column:
    """Sample-quantile bins per axis (weightedPartitioning): equal-count
    rather than equal-area — the skew-aware strategy."""
    import math
    n = max(int(math.isqrt(parallelism)), 1)
    probs = [k / n for k in range(1, n)]
    qx, qy = df.sample(sample, seed=7).approxQuantile(
        [lon, lat], probs, 0.01) if probs else ([], [])

    def bin_of(col: str, cuts: list[float]) -> Column:
        b = F.lit(0)
        for c in cuts:
            b = b + F.when(F.col(col) > c, 1).otherwise(0)
        return b.cast("int")

    ok = F.col(lon).isNotNull() & F.col(lat).isNotNull()
    return F.when(ok, bin_of(lon, qx) * n + bin_of(lat, qy)) \
        .otherwise(F.lit(-1))


def rtree_partition_id(df: DataFrame, *, lon: str = "lon",
                       lat: str = "lat", parallelism: int = 16,
                       sample: float = 0.1) -> Column:
    """STR-packed leaf envelopes from a sample (rtree strategy): sort the
    sample by x into ~sqrt(P) vertical strips, sort each strip by y, cut
    into leaves; a row takes the id of the first covering envelope,
    reserved -1 outside all of them (the sample missed that region)."""
    import math

    import numpy as np

    rows = (df.select(lon, lat).dropna()
            .sample(fraction=sample, seed=7).limit(100_000).collect())
    pts = np.array([(r[0], r[1]) for r in rows], dtype=np.float64)
    if len(pts) == 0:
        return F.lit(-1)
    p = max(parallelism, 1)
    nx = max(int(math.ceil(math.sqrt(p))), 1)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    envs: list[tuple[float, float, float, float]] = []
    for strip in np.array_split(pts, nx):
        if not len(strip):
            continue
        strip = strip[np.argsort(strip[:, 1], kind="stable")]
        for leaf in np.array_split(strip, max(int(round(p / nx)), 1)):
            if len(leaf):
                envs.append((float(leaf[:, 0].min()),
                             float(leaf[:, 1].min()),
                             float(leaf[:, 0].max()),
                             float(leaf[:, 1].max())))
    pid: Column = F.lit(-1)
    for i in reversed(range(len(envs))):
        x0, y0, x1, y1 = envs[i]
        cond = ((F.col(lon) >= x0) & (F.col(lon) <= x1)
                & (F.col(lat) >= y0) & (F.col(lat) <= y1))
        pid = F.when(cond, i).otherwise(pid)
    return pid


def spatial_repartition(df: DataFrame, *, strategy: str = "earth",
                        lon: str = "lon", lat: str = "lat",
                        parallelism: int = 16,
                        id_col: str = "partition_id") -> DataFrame:
    """Attach a partition id and co-locate rows on it. Two frames
    repartitioned with the SAME strategy + parameters join on
    ``partition_id`` without re-shuffling either side."""
    if strategy == "equal":
        pid = equal_partition_id(df, lon=lon, lat=lat,
                                 parallelism=parallelism)
    elif strategy == "earth":
        pid = earth_partition_id(lon=lon, lat=lat)
    elif strategy == "weighted":
        pid = weighted_partition_id(df, lon=lon, lat=lat,
                                    parallelism=parallelism)
    elif strategy == "rtree":
        pid = rtree_partition_id(df, lon=lon, lat=lat,
                                 parallelism=parallelism)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return df.withColumn(id_col, pid).repartition(id_col)
