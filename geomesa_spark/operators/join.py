"""Spatial joins: broadcast point-in-polygon and cell-partitioned equi-join.

Re-expresses the reference's sweepline spatial join (GeoMesaJoinRelation.
sweeplineJoin, /root/reference/geomesa-spark/geomesa-spark-sql/src/main/
scala/org/locationtech/geomesa/spark/GeoMesaJoinRelation.scala:41-91) as an
idiomatic Spark plan:

    regions --(cover cells pUDF + explode)--> (cell, region)
    points  --(cell_id pUDF)---------------> (cell, point)
    equi-join on cell  (broadcast-hash if regions are small: zero shuffle
                        of the big point side; sort-merge + AQE skew-join
                        otherwise)
    exact refine       (vectorized point-in-polygon over Arrow batches)
    dedupe             (only when both sides can span multiple cells --
                        duplication semantics of RelationUtils.gridIdMapper
                        :35-53 and its acknowledged duplicate TODO :38)

Correctness contract (SURVEY §2.4): covers over-select and never
under-select; every candidate passes the exact DE-9IM predicate; result
row-set equals the brute-force cartesian join (the reference's own oracle,
SparkSQLDataTest.scala:344-351).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from geomesa_spark.cells import PARTITION_RES, cell_id
from geomesa_spark.geo import io as gio
from geomesa_spark.geo import predicates as gp
from geomesa_spark.plans.planner import cell_cover_of_geometry

# predicate -> accepted point locations (I interior, B boundary) for
# point-vs-region joins; key is predicate(region, point)
_POINT_PREDICATES = {
    "st_contains": frozenset("I"),
    "st_within": frozenset("I"),      # within(point, region)
    "st_covers": frozenset("IB"),
    "st_coveredBy": frozenset("IB"),
    "st_intersects": frozenset("IB"),
}


def locate_points_in_geometry(x: np.ndarray, y: np.ndarray, geom) -> np.ndarray:
    """Vectorized point classification vs one geometry.

    Returns int8 array: 1 interior, 0 boundary, -1 exterior. Ray casting
    over all rings at once; O(points x edges) numpy ops, no per-point python.
    """
    from geomesa_spark.geo.model import Polygon

    n = len(x)
    out = np.full(n, -1, dtype=np.int8)
    for part in (p for p in _flatten(geom)):
        if isinstance(part, Polygon) and not part.is_empty():
            inside = np.zeros(n, dtype=bool)
            boundary = np.zeros(n, dtype=bool)
            for ri, ring in enumerate(part.rings()):
                cross = np.zeros(n, dtype=bool)
                ax, ay = ring[:-1, 0], ring[:-1, 1]
                bx, by = ring[1:, 0], ring[1:, 1]
                keep = ~((ax == bx) & (ay == by))
                ax, ay, bx, by = ax[keep], ay[keep], bx[keep], by[keep]
                for s in range(0, len(ax), 512):  # edge-chunk to bound memory
                    a_x, a_y = ax[s:s + 512][None, :], ay[s:s + 512][None, :]
                    b_x, b_y = bx[s:s + 512][None, :], by[s:s + 512][None, :]
                    px, py = x[:, None], y[:, None]
                    # boundary: collinear and within segment bbox
                    orient = (b_x - a_x) * (py - a_y) - (b_y - a_y) * (px - a_x)
                    on = (orient == 0.0) & (px >= np.minimum(a_x, b_x)) \
                        & (px <= np.maximum(a_x, b_x)) \
                        & (py >= np.minimum(a_y, b_y)) \
                        & (py <= np.maximum(a_y, b_y))
                    boundary |= on.any(axis=1)
                    # ray cast to +x
                    spans = (a_y > py) != (b_y > py)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xint = a_x + (py - a_y) * (b_x - a_x) / (b_y - a_y)
                    hits = spans & (xint > px)
                    cross ^= (hits.sum(axis=1) % 2).astype(bool)
                if ri == 0:
                    inside = cross
                else:  # hole: inside hole -> exterior
                    inside &= ~cross
            out = np.maximum(out, np.where(boundary, np.int8(0),
                                           np.where(inside, np.int8(1), np.int8(-1))))
        else:
            # non-polygon parts: exact per-row locate (rare side of a PIP join)
            for i in range(n):
                loc = gp.locate(part, float(x[i]), float(y[i]))
                code = 1 if loc == "I" else (0 if loc == "B" else -1)
                out[i] = max(out[i], code)
    return out


def _flatten(geom):
    from geomesa_spark.geo.model import flatten
    return flatten(geom)


# ------------------------------------------------------------------ UDFs

@F.pandas_udf(LongType())
def udf_point_cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(cell_id(lon.to_numpy(dtype=np.float64),
                             lat.to_numpy(dtype=np.float64), PARTITION_RES))


def udf_cover_cells(res: int):
    @F.pandas_udf(ArrayType(LongType()))
    def cover(wkb: pd.Series) -> pd.Series:
        memo: dict[bytes, list[int]] = {}
        out = []
        for v in wkb:
            if v is None:
                out.append([-1])
                continue
            key = bytes(v)
            c = memo.get(key)
            if c is None:
                g = gio.from_wkb(key)
                cov = cell_cover_of_geometry(g, res=res)
                c = [-1] if cov is None or len(cov) == 0 else [int(i) for i in cov]
                memo[key] = c
            out.append(c)
        return pd.Series(out)
    return cover


def udf_cover_cells_classified(res: int):
    """Cover cells tagged interior/boundary (cell_cover_classified): a
    point joined through an INTERIOR cell is provably in the region's
    interior, so the exact refine is skipped for it — the reference's
    contained-range shortcut applied to the join."""
    from pyspark.sql.types import StructField, StructType

    from geomesa_spark.plans.planner import cell_cover_classified

    schema = ArrayType(StructType([
        StructField("cell", LongType()),
        StructField("interior", BooleanType())]))

    @F.pandas_udf(schema)
    def cover(wkb: pd.Series) -> pd.Series:
        memo: dict[bytes, list] = {}
        out = []
        for v in wkb:
            if v is None:
                out.append([(-1, False)])
                continue
            key = bytes(v)
            c = memo.get(key)
            if c is None:
                g = gio.from_wkb(key)
                cov, interior = cell_cover_classified(g, res=res)
                if cov is None or len(cov) == 0:
                    c = [(-1, False)]
                else:
                    c = [(int(cell), bool(i))
                         for cell, i in zip(cov, interior)]
                memo[key] = c
            out.append(c)
        return pd.Series(out)
    return cover


def udf_refine_point(predicate: str):
    accepted = _POINT_PREDICATES[predicate]
    want_i = "I" in accepted
    want_b = "B" in accepted

    @F.pandas_udf(BooleanType())
    def refine(lon: pd.Series, lat: pd.Series, wkb: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64)
        y = lat.to_numpy(dtype=np.float64)
        out = np.zeros(len(x), dtype=bool)
        # group rows by identical region blob -> one vectorized pass each
        codes, uniques = pd.factorize(wkb.map(lambda b: bytes(b) if b is not None
                                              else b), use_na_sentinel=True)
        for gi, blob in enumerate(uniques):
            sel = codes == gi
            geom = gio.from_wkb(blob)
            loc = locate_points_in_geometry(x[sel], y[sel], geom)
            ok = np.zeros(int(sel.sum()), dtype=bool)
            if want_i:
                ok |= loc == 1
            if want_b:
                ok |= loc == 0
            out[sel] = ok
        return pd.Series(out)
    return refine


def udf_refine_pairs(predicate: str):
    """General geometry-pair refinement (polygon-polygon etc.)."""
    fn = {
        "st_contains": gp.contains, "st_within": gp.within,
        "st_covers": gp.covers, "st_coveredBy": gp.covered_by,
        "st_intersects": gp.intersects, "st_overlaps": gp.overlaps,
        "st_touches": gp.touches, "st_crosses": gp.crosses,
        "st_equals": gp.equals,
    }[predicate]

    @F.pandas_udf(BooleanType())
    def refine(a: pd.Series, b: pd.Series) -> pd.Series:
        memo: dict[bytes, object] = {}

        def parse(v):
            if v is None:
                return None
            k = bytes(v)
            if k not in memo:
                memo[k] = gio.from_wkb(k)
            return memo[k]

        return pd.Series([bool(fn(parse(x), parse(y)))
                          if x is not None and y is not None else False
                          for x, y in zip(a, b)])
    return refine


# ------------------------------------------------------------- public API

def spatial_join(points: DataFrame, regions: DataFrame, *,
                 predicate: str = "st_contains",
                 point_lon: str = "lon", point_lat: str = "lat",
                 region_geom: str = "geom",
                 res: int = PARTITION_RES,
                 broadcast_regions: bool | None = None,
                 salt: int | None = None) -> DataFrame:
    """Point-in-region spatial join.

    ``predicate(region, point)`` for st_contains/st_covers/st_intersects;
    st_within is interpreted as within(point, region). The point side keeps
    its partitioning when regions broadcast (zero shuffle of the big side).

    ``salt``: duplicate each region row into ``salt`` copies and scatter
    points across them before the equi-join — explicit skew spreading, the
    reference's shard strategy (ShardStrategy.scala:42-80). Prefer AQE
    skew-join; use salt for pathological hot cells.
    """
    if predicate not in _POINT_PREDICATES:
        raise ValueError(f"unsupported point-join predicate {predicate}")
    from geomesa_spark.cells.native import cell_expr
    pts = points.withColumn("__cell__",
                            cell_expr(point_lon, point_lat, res))
    reg = regions.withColumn(
        "__cells__", udf_cover_cells_classified(res)(F.col(region_geom))) \
        .withColumn("__c__", F.explode("__cells__")) \
        .withColumn("__cell__", F.col("__c__.cell")) \
        .withColumn("__int__", F.col("__c__.interior")) \
        .drop("__cells__", "__c__")
    if salt and salt > 1:
        reg = reg.withColumn("__salt__", F.explode(F.array(
            *[F.lit(i) for i in range(salt)])))
        pts = pts.withColumn("__salt__", F.pmod(F.xxhash64(point_lon, point_lat),
                                                F.lit(salt)).cast("int"))
        join_keys = ["__cell__", "__salt__"]
    else:
        join_keys = ["__cell__"]
    if broadcast_regions:
        reg = F.broadcast(reg)
    refine = udf_refine_point(predicate)
    joined = pts.join(reg, on=join_keys, how="inner")
    # interior-cell rows are provably 'I' for every supported predicate:
    # accept without the exact refine, and null the WKB argument so those
    # rows cross the Arrow boundary payload-free and skip the ray casting
    out = joined.where(F.when(F.col("__int__"), F.lit(True)).otherwise(
        refine(F.col(point_lon), F.col(point_lat),
               F.when(F.col("__int__"), F.lit(None))
               .otherwise(F.col(region_geom)))))
    drop = ["__cell__", "__int__"] \
        + (["__salt__"] if salt and salt > 1 else [])
    return out.drop(*drop)


def spatial_join_pairs(left: DataFrame, right: DataFrame, *,
                       predicate: str = "st_intersects",
                       left_geom: str = "geom", right_geom: str = "geom_r",
                       left_id: str = "left_id", right_id: str = "right_id",
                       res: int = PARTITION_RES,
                       broadcast_right: bool | None = None) -> DataFrame:
    """General geometry-geometry join: both sides explode to cover cells,
    equi-join on cell, exact refine, dedupe by (left_id, right_id) —
    duplicates arise exactly when both geometries span multiple shared cells
    (gridIdMapper duplication semantics, RelationUtils.scala:35-53)."""
    lf = left.withColumn("__cells__", udf_cover_cells(res)(F.col(left_geom))) \
             .withColumn("__cell__", F.explode("__cells__")).drop("__cells__")
    rf = right.withColumn("__cells__", udf_cover_cells(res)(F.col(right_geom))) \
              .withColumn("__cell__", F.explode("__cells__")).drop("__cells__")
    if broadcast_right:
        rf = F.broadcast(rf)
    refine = udf_refine_pairs(predicate)
    joined = lf.join(rf, on="__cell__", how="inner")
    out = joined.where(refine(F.col(left_geom), F.col(right_geom))) \
                .drop("__cell__") \
                .dropDuplicates([left_id, right_id])
    return out
