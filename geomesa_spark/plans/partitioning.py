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

Co-location contract: the data-dependent strategies (equal / weighted /
rtree) derive bin edges from the frame they are FITTED on, so two frames
only share a space -> id mapping when both apply the SAME fitted spec —
``fit_partitioner`` once, ``partition_id_from_spec`` on each side (the
reference fits on one relation and reuses the partition envelopes for the
other side too, RelationUtils.scala:85-204). Only the fixed ``earth``
grid is safe to recompute independently per frame.

Reserved-partition semantics: rows with no computable position (or, for
rtree, outside every sampled envelope) get id -1 and are kept, never
dropped."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from geomesa_spark.cells.native import cell_expr


def fit_partitioner(df: DataFrame, *, strategy: str = "earth",
                    lon: str = "lon", lat: str = "lat",
                    parallelism: int = 16, sample: float = 0.1,
                    res: int = 4) -> dict:
    """Learn a reusable space -> partition-id spec from ``df``.

    Returns a JSON-able dict; apply it to ANY frame (this one or
    another) with ``partition_id_from_spec`` — the only way two frames
    get the same mapping under the data-dependent strategies."""
    import math
    if strategy == "earth":
        return {"strategy": "earth", "res": int(res)}
    if strategy == "equal":
        n = max(int(math.isqrt(parallelism)), 1)
        b = df.agg(F.min(lon), F.max(lon),
                   F.min(lat), F.max(lat)).collect()[0]
        return {"strategy": "equal", "n": n,
                "bounds": [float(b[0]), float(b[1]),
                           float(b[2]), float(b[3])]}
    if strategy == "weighted":
        n = max(int(math.isqrt(parallelism)), 1)
        probs = [k / n for k in range(1, n)]
        qx, qy = df.sample(sample, seed=7).approxQuantile(
            [lon, lat], probs, 0.01) if probs else ([], [])
        return {"strategy": "weighted", "n": n,
                "cuts_x": [float(c) for c in qx],
                "cuts_y": [float(c) for c in qy]}
    if strategy == "rtree":
        return {"strategy": "rtree",
                "envs": _str_pack_envelopes(df, lon=lon, lat=lat,
                                            parallelism=parallelism,
                                            sample=sample)}
    raise ValueError(f"unknown strategy {strategy!r}")


def partition_id_from_spec(spec: dict, *, lon: str = "lon",
                           lat: str = "lat") -> Column:
    """Compile a fitted spec to the partition-id Column (pure Catalyst
    expression — no data dependence, so the same spec gives the same
    mapping on every frame it is applied to)."""
    ok = F.col(lon).isNotNull() & F.col(lat).isNotNull()
    s = spec["strategy"]
    if s == "earth":
        return cell_expr(lon, lat, spec["res"])
    if s == "equal":
        n = spec["n"]
        x0, x1, y0, y1 = spec["bounds"]
        dx = max((x1 - x0) / n, 1e-12)
        dy = max((y1 - y0) / n, 1e-12)
        i = F.least(F.floor((F.col(lon) - x0) / dx),
                    F.lit(n - 1)).cast("int")
        j = F.least(F.floor((F.col(lat) - y0) / dy),
                    F.lit(n - 1)).cast("int")
        return F.when(ok, i * n + j).otherwise(F.lit(-1))
    if s == "weighted":
        n = spec["n"]

        def bin_of(col: str, cuts: list[float]) -> Column:
            b = F.lit(0)
            for c in cuts:
                b = b + F.when(F.col(col) > c, 1).otherwise(0)
            return b.cast("int")

        return F.when(ok, bin_of(lon, spec["cuts_x"]) * n
                      + bin_of(lat, spec["cuts_y"])) \
            .otherwise(F.lit(-1))
    if s == "rtree":
        pid: Column = F.lit(-1)
        for i in reversed(range(len(spec["envs"]))):
            x0, y0, x1, y1 = spec["envs"][i]
            cond = ((F.col(lon) >= x0) & (F.col(lon) <= x1)
                    & (F.col(lat) >= y0) & (F.col(lat) <= y1))
            pid = F.when(cond, i).otherwise(pid)
        return pid
    raise ValueError(f"unknown strategy {s!r}")


def _str_pack_envelopes(df: DataFrame, *, lon: str, lat: str,
                        parallelism: int,
                        sample: float) -> list[list[float]]:
    """STR leaf envelopes from a bounded driver-side sample: sort by x
    into ~sqrt(P) vertical strips, sort each strip by y, cut into
    leaves."""
    import math

    import numpy as np

    rows = (df.select(lon, lat).dropna()
            .sample(fraction=sample, seed=7).limit(100_000).collect())
    pts = np.array([(r[0], r[1]) for r in rows], dtype=np.float64)
    if len(pts) == 0:
        return []
    p = max(parallelism, 1)
    nx = max(int(math.ceil(math.sqrt(p))), 1)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    envs: list[list[float]] = []
    for strip in np.array_split(pts, nx):
        if not len(strip):
            continue
        strip = strip[np.argsort(strip[:, 1], kind="stable")]
        for leaf in np.array_split(strip, max(int(round(p / nx)), 1)):
            if len(leaf):
                envs.append([float(leaf[:, 0].min()),
                             float(leaf[:, 1].min()),
                             float(leaf[:, 0].max()),
                             float(leaf[:, 1].max())])
    return envs


def equal_partition_id(df: DataFrame, *, lon: str = "lon",
                       lat: str = "lat", parallelism: int = 16) -> Column:
    """sqrt(n) x sqrt(n) grid over the DATA bounds (equalPartitioning).
    Fits on ``df`` itself — for a mapping shared across frames, fit once
    with ``fit_partitioner`` and apply the spec to each."""
    return partition_id_from_spec(
        fit_partitioner(df, strategy="equal", lon=lon, lat=lat,
                        parallelism=parallelism), lon=lon, lat=lat)


def earth_partition_id(*, lon: str = "lon", lat: str = "lat",
                       res: int = 4) -> Column:
    """Fixed whole-earth grid (earth strategy) = the Z2 cell itself."""
    return cell_expr(lon, lat, res)


def weighted_partition_id(df: DataFrame, *, lon: str = "lon",
                          lat: str = "lat", parallelism: int = 16,
                          sample: float = 0.1) -> Column:
    """Sample-quantile bins per axis (weightedPartitioning): equal-count
    rather than equal-area — the skew-aware strategy. Fits on ``df``
    itself; share a mapping across frames via ``fit_partitioner``."""
    return partition_id_from_spec(
        fit_partitioner(df, strategy="weighted", lon=lon, lat=lat,
                        parallelism=parallelism, sample=sample),
        lon=lon, lat=lat)


def rtree_partition_id(df: DataFrame, *, lon: str = "lon",
                       lat: str = "lat", parallelism: int = 16,
                       sample: float = 0.1) -> Column:
    """STR-packed leaf envelopes from a sample (rtree strategy): a row
    takes the id of the first covering envelope, reserved -1 outside all
    of them (the sample missed that region). Fits on ``df`` itself;
    share a mapping across frames via ``fit_partitioner``."""
    return partition_id_from_spec(
        fit_partitioner(df, strategy="rtree", lon=lon, lat=lat,
                        parallelism=parallelism, sample=sample),
        lon=lon, lat=lat)


def spatial_repartition(df: DataFrame, *, strategy: str = "earth",
                        lon: str = "lon", lat: str = "lat",
                        parallelism: int = 16,
                        id_col: str = "partition_id",
                        spec: dict | None = None) -> DataFrame:
    """Attach a partition id and co-locate rows on it.

    To co-partition TWO frames so they join on ``id_col`` with one
    consistent space -> id mapping, fit once and pass the same ``spec``
    to both calls::

        spec = fit_partitioner(big, strategy="rtree", parallelism=64)
        a = spatial_repartition(big, spec=spec)
        b = spatial_repartition(small, spec=spec)

    Without ``spec``, data-dependent strategies (equal/weighted/rtree)
    fit on ``df`` itself — correct for one frame, but two frames
    repartitioned independently would get DIFFERENT bin edges; only the
    fixed ``earth`` grid is frame-independent."""
    if spec is None:
        spec = fit_partitioner(df, strategy=strategy, lon=lon, lat=lat,
                               parallelism=parallelism)
    pid = partition_id_from_spec(spec, lon=lon, lat=lat)
    return df.withColumn(id_col, pid).repartition(id_col)
