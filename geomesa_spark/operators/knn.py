"""k-nearest-neighbors via expanding cell-window search.

Re-expresses the reference's kNN process (/root/reference/geomesa-process/
geomesa-process-vector/src/main/scala/org/locationtech/geomesa/process/query/
KNearestNeighborSearchProcess.scala): per query point an expanding search
window — initial radius from the Liu/Lim/Ng density estimate
``sqrt(k / (pi * density))`` (:278-300), doubled when a round comes back
empty — with exact geodesic meters and a per-query top-k.

Spark shape: the (small) query set explodes to its window's cover cells and
broadcast-joins the (huge) point table on the cell column — the big side is
never shuffled; per-round work is partition-pruned to the union of query
windows. Ranking is a window function (row_number over dist), the idiom the
reference anticipates for host engines (SpatialRelationFunctions.scala:51).

Exactness: a round's candidates provably include every point within w
meters of the query (conservative deg-per-meter bounds); a query finishes
when >= k candidates lie within w. Driver-side state is O(|queries| * k)
— the reference's client-side KnnWindow, not a data-scale collect.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType

from geomesa_spark.cells import PARTITION_RES, bbox_cover
from geomesa_spark.geo.measures import EARTH_MEAN_RADIUS_M

_M_PER_DEG = math.pi / 180.0 * EARTH_MEAN_RADIUS_M  # ~111194.93


@F.pandas_udf(DoubleType())
def udf_haversine(lon1: pd.Series, lat1: pd.Series,
                  lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    from geomesa_spark.geo.measures import haversine_m
    return pd.Series(haversine_m(lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
                                 lon2.to_numpy(np.float64), lat2.to_numpy(np.float64)))


def _window_cells(qlon: float, qlat: float, w_m: float, res: int) -> list[int]:
    dlat = w_m / _M_PER_DEG
    phi_m = min(89.999, abs(qlat) + dlat)
    dlon = min(180.0, w_m / (_M_PER_DEG * math.cos(math.radians(phi_m))))
    y0 = max(-90.0, qlat - dlat)
    y1 = min(90.0, qlat + dlat)
    x0 = qlon - dlon
    x1 = qlon + dlon
    if x1 - x0 >= 360.0:
        x0, x1 = -180.0, 180.0
    else:  # wrap across the antimeridian (bbox_cover splits on x0 > x1)
        if x0 < -180.0:
            x0 += 360.0
        if x1 > 180.0:
            x1 -= 360.0
    return [int(c) for c in bbox_cover(x0, y0, x1, y1, res=res, max_cells=1 << 22)]


def knn_join(points: DataFrame, queries: list[tuple[str, float, float]],
             k: int, *,
             lon: str = "lon", lat: str = "lat",
             res: int = PARTITION_RES,
             estimated_count: int | None = None,
             tiebreak: list[str] | None = None,
             initial_radius_m: float | None = None,
             max_radius_m: float = 2.1e7,
             max_rounds: int = 12) -> DataFrame:
    """Exact k nearest points for each (query_id, lon, lat) query.

    Returns a DataFrame (query_id, rank, dist_m, <point columns>). The
    result is exact under haversine distance; ties broken by point order.
    """
    spark = points.sparkSession
    if initial_radius_m is None:
        n = estimated_count if estimated_count is not None else points.count()
        world_area_deg2 = 360.0 * 180.0
        density = max(n, 1) / world_area_deg2  # points per deg^2
        r_deg = math.sqrt(k / (math.pi * density))  # Liu/Lim/Ng estimate
        initial_radius_m = max(1000.0, r_deg * _M_PER_DEG)

    live = {qid: initial_radius_m for (qid, _, _) in queries}
    qpos = {qid: (qlon, qlat) for (qid, qlon, qlat) in queries}
    done_frames: list[DataFrame] = []

    for _ in range(max_rounds):
        if not live:
            break
        rows = []
        for qid, w in live.items():
            qlon, qlat = qpos[qid]
            for c in _window_cells(qlon, qlat, w, res):
                rows.append((qid, qlon, qlat, w, c))
        qdf = spark.createDataFrame(
            rows, "query_id string, qlon double, qlat double, w double, cell long")
        cand = (points.join(F.broadcast(qdf),
                            on=points["cell_prefix"] == qdf["cell"], how="inner")
                if "cell_prefix" in points.columns
                else points.withColumn(
                    "__pc__", _cell_expr(lon, lat, res)).join(
                    F.broadcast(qdf), on=F.col("__pc__") == qdf["cell"],
                    how="inner").drop("__pc__"))
        cand = cand.withColumn("dist_m", udf_haversine(
            F.col(lon), F.col(lat), F.col("qlon"), F.col("qlat")))
        cand = cand.where(F.col("dist_m") <= F.col("w"))
        order = [F.col("dist_m")] + [F.col(c) for c in (tiebreak or [])]
        ranked = cand.withColumn(
            "rank", F.row_number().over(
                Window.partitionBy("query_id").orderBy(*order))) \
            .where(F.col("rank") <= k).drop("cell", "w")
        counts = {r.query_id: r.n for r in
                  ranked.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
        finished = [qid for qid in live if counts.get(qid, 0) >= k]
        if finished:
            fin = ranked.where(F.col("query_id").isin(finished))
            done_frames.append(fin)
            for qid in finished:
                del live[qid]
        for qid in list(live):
            if live[qid] >= max_radius_m:
                # fewer than k points exist in range: emit what we have
                done_frames.append(ranked.where(F.col("query_id") == qid))
                del live[qid]
            else:
                live[qid] = min(max_radius_m, live[qid] * 2.0)  # reference growth
    if not done_frames:
        return spark.createDataFrame([], "query_id string, rank int, dist_m double")
    out = done_frames[0]
    for f in done_frames[1:]:
        out = out.unionByName(f)
    return out


def _cell_expr(lon: str, lat: str, res: int):
    from geomesa_spark.cells.native import cell_expr
    return cell_expr(lon, lat, res)
