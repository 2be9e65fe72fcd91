"""OpenStreetMap ingest (geomesa-convert-osm parity, XML flavor).

Reference scope (/root/reference/geomesa-convert/geomesa-convert-osm/
src/main/scala/org/locationtech/geomesa/convert/osm/ — OsmNodesConverter
maps nodes to point features with their tag map; OsmWaysConverter maps
ways to LineStrings by resolving member node coordinates). The reference
resolves way members through an in-process node cache; at 100 TB-of-OSM
scale that cache IS a distributed join, so this build expresses it as
one: posexplode(refs) -> equi-join on node_id -> sort_array(collect_list)
per way. PBF input needs protobuf (absent in this container); the XML
format covers the semantics.

Raw parse runs distributed: one task per .osm file via binaryFile +
stdlib ElementTree (files are the natural parallel unit for XML; a
single planet-scale file should be pre-split upstream, as the reference
requires too)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_NODE_SCHEMA = ("node_id long, lon double, lat double, "
                "tags map<string,string>")
_WAY_SCHEMA = "way_id long, refs array<long>, tags map<string,string>"


def _tags(el) -> dict:
    return {t.get("k"): t.get("v") for t in el.findall("tag")}


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    """(node_id, lon, lat, tags) — one row per <node>."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                for el in root.iter("node"):
                    rows.append({
                        "node_id": int(el.get("id")),
                        "lon": float(el.get("lon")),
                        "lat": float(el.get("lat")),
                        "tags": _tags(el)})
            if rows:
                yield pd.DataFrame(rows, columns=["node_id", "lon",
                                                  "lat", "tags"])

    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.osm").load(path)
            .select("content").mapInPandas(parse, _NODE_SCHEMA))


def read_osm_ways(spark: SparkSession, path: str) -> DataFrame:
    """(way_id, refs, tags) — one row per <way>, member node ids in
    document order (unresolved; see ``osm_way_geometries``)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                for el in root.iter("way"):
                    rows.append({
                        "way_id": int(el.get("id")),
                        "refs": [int(nd.get("ref"))
                                 for nd in el.findall("nd")],
                        "tags": _tags(el)})
            if rows:
                yield pd.DataFrame(rows, columns=["way_id", "refs",
                                                  "tags"])

    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.osm").load(path)
            .select("content").mapInPandas(parse, _WAY_SCHEMA))


def osm_way_geometries(nodes: DataFrame, ways: DataFrame,
                       *, drop_incomplete: bool = True) -> DataFrame:
    """Resolve way member coordinates into LineString WKB — the
    distributed form of the reference's node-cache lookup.

    Plan: posexplode(refs) keeps member order as an explicit column, the
    equi-join on node_id shuffles only (way_id, pos, node_id) triples
    plus the matched coordinates (never the tag maps), and
    sort_array(collect_list(struct(pos, lon, lat))) rebuilds each way in
    order with one partial-aggregated groupBy. Ways referencing missing
    nodes are dropped (``drop_incomplete``, the reference's skip mode) or
    kept with NULL geometry.

    Output: (way_id, geom WKB, n_points, tags)."""
    m = ways.select("way_id",
                    F.posexplode("refs").alias("pos", "node_id"))
    n_refs = ways.select(
        "way_id", F.size("refs").alias("__n_refs__"), "tags")
    # dedupe node ids first: overlapping regional extracts legitimately
    # repeat nodes, and a duplicated id would match each ref position
    # twice, inflating __n_got__ past __n_refs__ below (the completeness
    # check would then NULL-out — and drop_incomplete delete — every way
    # touching that node)
    uniq_nodes = (nodes.select("node_id", "lon", "lat")
                  .dropDuplicates(["node_id"]))
    joined = m.join(uniq_nodes, "node_id")
    coords = (joined.groupBy("way_id")
              .agg(F.sort_array(F.collect_list(
                  F.struct("pos", "lon", "lat"))).alias("pts")))

    @F.pandas_udf("binary")
    def to_line_wkb(pts: pd.Series) -> pd.Series:
        from geomesa_spark.geo.io import to_wkb
        from geomesa_spark.geo.model import LineString
        out = []
        for arr in pts:
            # UDFs under when() still run for every row: a way with NO
            # resolved members arrives as null, a 1-member way can't make
            # a line — both yield null (when() discards them anyway)
            if arr is None or len(arr) < 2:
                out.append(None)
                continue
            out.append(bytes(to_wkb(LineString(
                [[p["lon"], p["lat"]] for p in arr]))))
        return pd.Series(out)

    out = (n_refs.join(coords, "way_id", "left")
           .withColumn("__n_got__", F.coalesce(F.size("pts"), F.lit(0)))
           .withColumn("geom", F.when(
               F.col("__n_got__") == F.col("__n_refs__"),
               to_line_wkb(F.col("pts"))))
           .select("way_id", "geom",
                   F.col("__n_got__").alias("n_points"), "tags"))
    if drop_incomplete:
        out = out.where(F.col("geom").isNotNull())
    return out
