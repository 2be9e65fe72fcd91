"""Converter framework + footprint density renderer tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geo import LineString, Point, Polygon, to_wkb


class TestConverter:
    def test_csv_conversion_with_skip_mode(self, spark, tmp_path):
        from geomesa_spark.sources.convert import image_manifest_converter
        p = str(tmp_path / "m.csv")
        with open(p, "w") as f:
            f.write("img-1,10.5,20.5,64,64,rawz,hello\n")
            f.write("img-2,not_a_number,20.5,64,64,q5,bad lon\n")  # skipped
            f.write("img-3,-120.25,45.0,32,32,rawz,third\n")
        conv = image_manifest_converter()
        out = conv.from_csv(spark, p)
        rows = {r["image_id"]: r for r in out.collect()}
        assert set(rows) == {"img-1", "img-3"}
        assert rows["img-1"]["lon"] == 10.5
        assert rows["img-3"]["w"] == 32
        assert out.schema["lon"].dataType.simpleString() == "double"

    def test_raise_mode_fails_on_bad_record(self, spark, tmp_path):
        from geomesa_spark.sources.convert import image_manifest_converter
        p = str(tmp_path / "bad.csv")
        with open(p, "w") as f:
            f.write("img-1,oops,20.5,64,64,rawz,x\n")
        conv = image_manifest_converter()
        conv.mode = "raise"
        with pytest.raises(Exception):
            conv.from_csv(spark, p).collect()

    def test_json_and_fixed_width(self, spark, tmp_path):
        from geomesa_spark.sources.convert import Converter, Field
        jp = str(tmp_path / "d.json")
        with open(jp, "w") as f:
            f.write('{"id": "a", "x": "1.5"}\n{"id": "b", "x": "2.5"}\n')
        conv = Converter(fields=[Field("fid", "string", "id"),
                                 Field("x", "double", "try_cast(x as double)")])
        got = {(r["fid"], r["x"]) for r in conv.from_json(spark, jp).collect()}
        assert got == {("a", 1.5), ("b", 2.5)}

        fp = str(tmp_path / "f.txt")
        with open(fp, "w") as f:
            f.write("alpha 00123\n")
            f.write("beta  00456\n")
        conv2 = Converter(fields=[Field("name", "string", "c1"),
                                  Field("n", "int", "try_cast(c2 as int)")])
        got2 = {(r["name"], r["n"]) for r in conv2.from_fixed_width(
            spark, fp, [("c1", 1, 6), ("c2", 7, 5)]).collect()}
        assert got2 == {("alpha", 123), ("beta", 456)}


class TestDensityFootprint:
    ENV = (0.0, 0.0, 10.0, 10.0)

    def _run(self, spark, geoms, **kw):
        from geomesa_spark.operators.density import density_footprint
        df = spark.createDataFrame(
            [(i, bytearray(to_wkb(g))) for i, g in enumerate(geoms)],
            "id long, geom binary")
        out = density_footprint(df, envelope=self.ENV, width=10, height=10,
                                **kw)
        return {(r["col"], r["row"]): r["weight"] for r in out.collect()}

    def test_point_matches_point_density(self, spark):
        got = self._run(spark, [Point(2.5, 3.5), Point(2.5, 3.5),
                                Point(9.9, 0.1)])
        assert got == {(2, 3): 2.0, (9, 0): 1.0}

    def test_line_is_connected_bresenham(self, spark):
        got = self._run(spark, [LineString([[0.5, 0.5], [9.5, 0.5]])])
        # horizontal line through row 0: every col 0..9 exactly once
        assert got == {(c, 0): 1.0 for c in range(10)}

    def test_diagonal_line_no_double_count_at_joints(self, spark):
        got = self._run(spark, [LineString([[0.5, 0.5], [4.5, 4.5],
                                            [9.5, 4.5]])])
        assert all(w == 1.0 for w in got.values())
        assert (0, 0) in got and (4, 4) in got and (9, 4) in got

    def test_polygon_fill_covers_interior(self, spark):
        got = self._run(spark, [Polygon([[1.0, 1.0], [8.0, 1.0], [8.0, 8.0],
                                         [1.0, 8.0], [1.0, 1.0]])])
        # all interior pixels present with the full weight
        for c in range(2, 7):
            for r in range(2, 7):
                assert got.get((c, r)) == 1.0
        # nothing outside the snapped bbox
        assert all(1 <= c <= 8 and 1 <= r <= 8 for (c, r) in got)

    def test_weight_column(self, spark):
        from geomesa_spark.operators.density import density_footprint
        df = spark.createDataFrame(
            [(1, bytearray(to_wkb(Point(2.5, 3.5))), 5.0),
             (2, bytearray(to_wkb(Point(2.5, 3.5))), 2.5)],
            "id long, geom binary, wt double")
        out = density_footprint(df, envelope=self.ENV, width=10, height=10,
                                weight="wt")
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["weight"] == 7.5


class TestAvroOrcConverters:
    def test_avro_container_roundtrip_through_spark(self, spark, tmp_path):
        """Write container files with the pure-Python encoder, read them
        back distributed (binaryFile + decoder), convert onto a declared
        schema — geomesa-convert avro parity without the spark-avro jar."""
        from geomesa_spark.sources.avro import write_container
        from geomesa_spark.sources.convert import Converter, Field
        schema = {"type": "record", "name": "obs", "fields": [
            {"name": "oid", "type": "long"},
            {"name": "lon", "type": "double"},
            {"name": "lat", "type": "double"},
            {"name": "label", "type": ["null", "string"]}]}
        recs = [{"oid": i, "lon": float(i % 50) - 20.0,
                 "lat": float(i % 30) - 10.0,
                 "label": None if i % 5 == 0 else f"L{i}"}
                for i in range(500)]
        for k, codec in ((0, "null"), (1, "deflate")):
            part = recs[k * 250:(k + 1) * 250]
            (tmp_path / f"part{k}.avro").write_bytes(
                write_container(schema, part, codec=codec))
        conv = Converter(fields=[
            Field("oid", "long", "oid"),
            Field("lon", "double", "lon"),
            Field("lat", "double", "lat"),
            Field("label", "string", "label")],
            required=["oid", "lon", "lat"])
        out = conv.from_avro(spark, str(tmp_path))
        rows = {r["oid"]: (r["lon"], r["lat"], r["label"])
                for r in out.collect()}
        assert len(rows) == 500
        assert rows[7] == (7 % 50 - 20.0, 7 % 30 - 10.0, "L7")
        assert rows[10][2] is None

    def test_orc_converter(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from geomesa_spark.sources.convert import Converter, Field
        src = spark.range(100).select(
            F.col("id").alias("oid"),
            (F.col("id") * 1.5).alias("x"),
            F.concat(F.lit("v"), F.col("id")).alias("tag"))
        path = str(tmp_path / "orc_table")
        src.write.orc(path)
        conv = Converter(fields=[
            Field("oid", "long", "oid"),
            Field("x2", "double", "x * 2"),
            Field("tag", "string", "tag")])
        out = conv.from_orc(spark, path)
        rows = {r["oid"]: (r["x2"], r["tag"]) for r in out.collect()}
        assert len(rows) == 100 and rows[4] == (12.0, "v4")
