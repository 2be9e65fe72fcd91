"""Regression tests for the seventh round-5 adversarial review batch
(geo/model.py + geo/io.py + sources/shapefile.py empty-geometry sweep).

Each test pins one fixed defect:

- LineString.bounds()/Polygon.bounds() raised ValueError (numpy min of a
  zero-size array) on EMPTY geometries, while Point/_Multi returned the
  NaN envelope every consumer was written against (measures.envelope
  guards `isfinite`, cell_cover_of_geometry guards `is_empty`). Any
  LINESTRING/POLYGON EMPTY row reaching st_envelope or a spatial-join
  cover UDF crashed the executor. JTS getEnvelopeInternal returns a null
  envelope instead (never throws).
- from_wkt rejected the OGC/JTS-legal `EMPTY` element inside multi
  geometries (`MULTILINESTRING ((0 0, 1 1), EMPTY)` raised ValueError:
  could not convert string to float: 'EMPTY'); to_wkt emitted the
  invalid `()` / `(nan nan)` for empty parts instead of `EMPTY`
  (JTS WKTWriter parity).
- write_shp crashed on empty geometries (same zero-size reduction) and
  NaN-poisoned the header bbox; the shapefile spec's Null Shape (type 0)
  is the correct record for them, and empty parts inside a non-empty
  multi must be dropped from the part array.
"""

import struct

import numpy as np

from geomesa_spark.geo import io as gio
from geomesa_spark.geo import measures
from geomesa_spark.geo.model import LineString, Point, Polygon


class TestEmptyBounds:
    def test_linestring_empty_bounds_nan(self):
        b = LineString(np.empty((0, 2))).bounds()
        assert len(b) == 4 and all(np.isnan(v) for v in b)

    def test_polygon_empty_bounds_nan(self):
        b = Polygon(np.empty((0, 2))).bounds()
        assert len(b) == 4 and all(np.isnan(v) for v in b)

    def test_envelope_of_empty(self):
        for wkt in ("LINESTRING EMPTY", "POLYGON EMPTY"):
            env = measures.envelope(gio.from_wkt(wkt))
            assert gio.to_wkt(env) == "POLYGON EMPTY"

    def test_st_envelope_sql_surface(self, spark):
        df = spark.sql(
            "SELECT st_asText(st_envelope(st_geomFromWKT("
            "'LINESTRING EMPTY'))) AS w")
        assert df.collect()[0].w == "POLYGON EMPTY"

    def test_cell_cover_of_empty_is_disjoint(self):
        from geomesa_spark.plans.planner import cell_cover_of_geometry
        cov = cell_cover_of_geometry(gio.from_wkt("POLYGON EMPTY"))
        assert cov is not None and len(cov) == 0


class TestWktEmptyComponents:
    CASES = [
        "MULTILINESTRING ((0 0, 1 1), EMPTY)",
        "MULTIPOINT (EMPTY, (1 2))",
        "MULTIPOLYGON (EMPTY, ((0 0, 1 0, 1 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING (0 0, 1 1))",
    ]

    def test_parse_and_roundtrip(self):
        for wkt in self.CASES:
            g = gio.from_wkt(wkt)
            assert gio.to_wkt(g) == wkt                       # writer parity
            assert gio.to_wkt(gio.from_wkt(wkt)) == wkt       # parser stable
            assert gio.to_wkt(gio.from_wkb(gio.to_wkb(g))) == wkt  # via WKB

    def test_empty_part_counts(self):
        g = gio.from_wkt("MULTILINESTRING ((0 0, 1 1), EMPTY)")
        assert len(g.parts) == 2
        assert not g.parts[0].is_empty() and g.parts[1].is_empty()
        assert not g.is_empty()  # one non-empty part


class TestGeoJsonEmpty:
    def test_roundtrip_and_valid_json(self):
        import json
        for wkt in ("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
                    "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY",
                    "MULTILINESTRING ((0 0, 1 1), EMPTY)"):
            gj = gio.to_geojson(gio.from_wkt(wkt))
            json.loads(gj)  # NaN coordinates would make this raise
            assert gio.to_wkt(gio.from_geojson(gj)) == wkt


class TestShapefileEmpty:
    def test_write_shp_empty_rows_null_shape(self):
        from geomesa_spark.sources.shapefile import read_shp, write_shp
        geoms = [Point(1, 2),
                 gio.from_wkt("LINESTRING EMPTY"),
                 gio.from_wkt("POLYGON EMPTY")]
        data = write_shp(geoms)
        bbox = struct.unpack("<8d", data[36:100])[:4]
        assert bbox == (1.0, 2.0, 1.0, 2.0)  # empties excluded, no NaN
        back = read_shp(data)
        assert gio.to_wkt(back[0]) == "POINT (1 2)"
        assert back[1] is None and back[2] is None  # spec Null Shape

    def test_write_shp_empty_part_in_multi(self):
        from geomesa_spark.sources.shapefile import read_shp, write_shp
        g = gio.from_wkt("MULTILINESTRING ((0 0, 1 1), EMPTY)")
        back = read_shp(write_shp([g]))
        # the empty part is dropped from the part array (a 0-point part
        # is invalid per spec); the non-empty linework survives
        assert gio.to_wkt(back[0]) == "LINESTRING (0 0, 1 1)"


class TestJoinWithEmptyGeometry:
    def test_pair_join_empty_matches_nothing(self, spark):
        from geomesa_spark.operators.join import spatial_join_pairs
        sq = gio.to_wkb(gio.from_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
        empty = gio.to_wkb(gio.from_wkt("POLYGON EMPTY"))
        left = spark.createDataFrame(
            [(1, bytearray(sq)), (2, bytearray(empty))],
            "left_id int, geom binary")
        right = spark.createDataFrame(
            [(10, bytearray(sq))], "right_id int, geom_r binary")
        rows = spatial_join_pairs(left, right).select(
            "left_id", "right_id").collect()
        # no executor crash; the empty geometry intersects nothing
        assert sorted((r.left_id, r.right_id) for r in rows) == [(1, 10)]
