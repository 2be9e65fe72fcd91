"""Export formats + geometric aggregates.

- BIN format: the reference's compact viz encoding — 16-byte records
  (trackId:int32, dtg-seconds:int32, lat:float32, lon:float32), 24-byte
  when a label is attached (/root/reference/geomesa-index-api/src/main/
  scala/org/locationtech/geomesa/index/iterators/BinAggregatingScan.scala:
  31-55; record layout geomesa-utils/.../bin/BinaryOutputEncoder).
- GeoJSON export: one RFC 7946 Feature per row
  (/root/reference/geomesa-spark/geomesa-spark-core/src/main/scala/org/
  locationtech/geomesa/spark/SpatialRDD.scala:59-73).
- Arrow export: Spark is Arrow-native — ``df.toArrow()`` covers ArrowScan
  (/root/reference/geomesa-index-api/.../iterators/ArrowScan.scala).
- ConvexHull aggregate: the reference's UDAF (/root/reference/
  geomesa-spark/geomesa-spark-jts/src/main/scala/org/locationtech/
  geomesa/spark/jts/udaf/ConvexHull.scala:16-51) as a two-phase
  salt -> partial hull -> merge hull program: associative, bounded
  per-task state, no giant collect_list on hot groups.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def to_bin_records(df: DataFrame, *, track: str, ts: str = "ts",
                   lon: str = "lon", lat: str = "lat",
                   label: str | None = None) -> DataFrame:
    """Encode rows into BIN records: (track_hash, payload binary).

    track id = 32-bit hash of the track attribute (string tracks hash like
    the reference's trackId dictionary); dtg = epoch seconds int32;
    lat/lon float32 little-endian. Output column ``bin`` is 16 (or 24 with
    label) bytes per row; downstream concatenation yields the wire format.
    """
    fmt = "<iiff" + ("8s" if label else "")
    out_schema = "track_hash int, bin binary"
    cols = [track, ts, lon, lat] + ([label] if label else [])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            th = pd.util.hash_array(
                pdf[track].astype(str).to_numpy()).astype(np.int64) \
                .astype(np.uint32).astype(np.int32)
            secs = (pdf[ts].astype("int64") // 1_000_000_000).astype(np.int32)
            la = pdf[lat].astype(np.float32)
            lo = pdf[lon].astype(np.float32)
            if label:
                lab = pdf[label].astype(str).str.encode("utf-8") \
                    .str.slice(0, 8)
                recs = [struct.pack(fmt, int(a), int(b), float(c), float(d),
                                    e.ljust(8, b"\0"))
                        for a, b, c, d, e in zip(th, secs, la, lo, lab)]
            else:
                recs = [struct.pack(fmt, int(a), int(b), float(c), float(d))
                        for a, b, c, d in zip(th, secs, la, lo)]
            yield pd.DataFrame({"track_hash": th, "bin": recs})

    return df.select(*cols).mapInPandas(encode, out_schema)


def to_geojson_features(df: DataFrame, *, lon: str = "lon",
                        lat: str = "lat",
                        id_col: str | None = None) -> DataFrame:
    """One GeoJSON Feature string per row; all non-geometry columns become
    properties (SpatialRDD.toGeoJSON semantics). Pure JVM for the geometry;
    property assembly via to_json."""
    props = [c for c in df.columns if c not in (lon, lat)]
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        *([F.col(id_col).alias("id")] if id_col else []),
        F.struct(F.lit("Point").alias("type"),
                 F.array(F.col(lon), F.col(lat)).alias("coordinates")
                 ).alias("geometry"),
        F.struct(*[F.col(c) for c in props]).alias("properties")))
    return df.select(feature.alias("geojson"))


def convex_hull_agg(df: DataFrame, *, group_cols: list[str] | None = None,
                    lon: str = "lon", lat: str = "lat",
                    salt: int = 16) -> DataFrame:
    """Convex hull of the points in each group, as WKT polygon.

    Two-phase: points -> (group, salt) partial hulls (bounded size) ->
    hull of partial hull vertices. Matches the UDAF's incremental
    union().convexHull() semantics with associative merges."""
    group_cols = group_cols or []

    def hull_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        pts = np.unique(np.column_stack([x, y]), axis=0)  # sorted lex
        if len(pts) <= 2:
            return pts
        def half(p):
            out = []
            for v in p:
                while len(out) >= 2 and np.cross(
                        out[-1] - out[-2], v - out[-2]) <= 0:
                    out.pop()
                out.append(v)
            return out
        lower = half(pts)
        upper = half(pts[::-1])
        return np.array(lower[:-1] + upper[:-1])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        h = hull_xy(pdf[lon].to_numpy(np.float64),
                    pdf[lat].to_numpy(np.float64))
        base = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame([{**base,
                              "xs": h[:, 0].tolist(),
                              "ys": h[:, 1].tolist()}])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.concatenate([np.asarray(v) for v in pdf["xs"]])
        y = np.concatenate([np.asarray(v) for v in pdf["ys"]])
        h = hull_xy(x, y)
        if len(h) == 1:
            wkt = f"POINT ({h[0, 0]:.17g} {h[0, 1]:.17g})"
        elif len(h) == 2:
            wkt = (f"LINESTRING ({h[0, 0]:.17g} {h[0, 1]:.17g}, "
                   f"{h[1, 0]:.17g} {h[1, 1]:.17g})")
        else:
            ring = ", ".join(f"{a:.17g} {b:.17g}" for a, b in h)
            first = f"{h[0, 0]:.17g} {h[0, 1]:.17g}"
            wkt = f"POLYGON (({ring}, {first}))"
        base = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame([{**base, "hull_wkt": wkt}])

    gtypes = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields if f.name in group_cols)
    sep = ", " if gtypes else ""
    mid_schema = f"{gtypes}{sep}xs array<double>, ys array<double>"
    out_schema = f"{gtypes}{sep}hull_wkt string"

    salted = df.withColumn("__salt__", F.pmod(
        F.xxhash64(F.col(lon), F.col(lat)), F.lit(salt)).cast("int"))
    partials = salted.groupBy(*group_cols, "__salt__") \
        .applyInPandas(lambda p: partial(p), mid_schema)
    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(
            lambda p: merge(p), out_schema)
    return partials.withColumn("__g__", F.lit(1)).groupBy("__g__") \
        .applyInPandas(lambda p: merge(p).assign(__g__=1),
                       f"__g__ int, {out_schema}") \
        .drop("__g__")
