"""Point2Point / TrackLabel / DateOffset / HashAttribute process tests
(reference semantics: Point2PointProcess.scala:73-108,
TrackLabelProcess.scala:54-61, DateOffsetProcess.scala:40-52,
HashAttributeProcess.scala:48-58)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.processes import (date_offset, hash_attribute,
                                               hash_attribute_color,
                                               parse_duration_seconds,
                                               point2point, track_label)


@pytest.fixture()
def tracks(spark):
    rows = [
        # track a: 4 points across two days
        ("a", "2024-01-01T10:00:00", 0.0, 0.0, 1),
        ("a", "2024-01-01T11:00:00", 1.0, 0.0, 2),
        ("a", "2024-01-02T10:00:00", 2.0, 0.0, 3),
        ("a", "2024-01-02T11:00:00", 3.0, 0.0, 4),
        # track b: only 2 points (filtered by min_points=2: needs > 2)
        ("b", "2024-01-01T10:00:00", 5.0, 5.0, 5),
        ("b", "2024-01-01T11:00:00", 6.0, 5.0, 6),
        # track c: stationary pair (zero-length segment)
        ("c", "2024-01-01T10:00:00", 7.0, 7.0, 7),
        ("c", "2024-01-01T11:00:00", 7.0, 7.0, 8),
        ("c", "2024-01-01T12:00:00", 8.0, 7.0, 9),
    ]
    return (spark.createDataFrame(
        rows, "trk string, ts_s string, lon double, lat double, id long")
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))


class TestPoint2Point:
    def test_consecutive_segments_sorted(self, spark, tracks):
        out = point2point(tracks, group="trk", sort="ts",
                          min_points=2, tiebreak=["id"]).collect()
        a = sorted((r.seg, r.x1, r.x2) for r in out if r.trk == "a")
        assert a == [(0, 0.0, 1.0), (1, 1.0, 2.0), (2, 2.0, 3.0)]
        # b has exactly min_points rows -> strict > excludes it
        assert not [r for r in out if r.trk == "b"]

    def test_filter_singular_drops_zero_length(self, spark, tracks):
        out = point2point(tracks, group="trk", sort="ts",
                          min_points=2, tiebreak=["id"])
        c = [r for r in out.collect() if r.trk == "c"]
        assert len(c) == 1 and c[0].x1 == 7.0 and c[0].x2 == 8.0
        keep = point2point(tracks, group="trk", sort="ts", min_points=2,
                           filter_singular=False, tiebreak=["id"])
        assert len([r for r in keep.collect() if r.trk == "c"]) == 2

    def test_break_on_day(self, spark, tracks):
        out = point2point(tracks, group="trk", sort="ts", min_points=2,
                          break_on_day=True, tiebreak=["id"]).collect()
        a = sorted((r.x1, r.x2) for r in out if r.trk == "a")
        # no segment crosses the midnight boundary (1.0 -> 2.0 is gone)
        assert a == [(0.0, 1.0), (2.0, 3.0)]

    def test_distance_is_orthodromic(self, spark, tracks):
        out = point2point(tracks, group="trk", sort="ts", min_points=2,
                          tiebreak=["id"]).collect()
        seg = [r for r in out if r.trk == "a" and r.seg == 0][0]
        # 1 degree of longitude at the equator ~ 111.2 km
        assert abs(seg.dist_m - 111195) < 100


class TestTrackLabel:
    def test_latest_per_track(self, spark, tracks):
        out = track_label(tracks, track="trk", dtg="ts",
                          tiebreak=["id"]).collect()
        got = {r.trk: r.id for r in out}
        assert got == {"a": 4, "b": 6, "c": 9}

    def test_tie_break_deterministic(self, spark):
        df = spark.createDataFrame(
            [("t", "2024-01-01T10:00:00", 1),
             ("t", "2024-01-01T10:00:00", 2)],
            "trk string, ts_s string, id long") \
            .withColumn("ts", F.to_timestamp("ts_s"))
        out = track_label(df, track="trk", dtg="ts", tiebreak=["id"])
        assert out.collect()[0].id == 2

    def test_requires_order(self, spark, tracks):
        with pytest.raises(ValueError):
            track_label(tracks, track="trk")


class TestDateOffset:
    @pytest.mark.parametrize("txt,secs", [
        ("P1D", 86400), ("PT2H", 7200), ("P1DT2H", 93600),
        ("PT2H30M", 9000), ("-PT15S", -15), ("PT90S", 90)])
    def test_duration_parse(self, txt, secs):
        assert parse_duration_seconds(txt) == secs

    def test_invalid_duration(self):
        for bad in ("P", "1D", "PT", "P1W"):
            with pytest.raises(ValueError):
                parse_duration_seconds(bad)

    def test_offset_shifts(self, spark, tracks):
        out = date_offset(tracks, date_col="ts", offset="P1D")
        a = out.where((F.col("trk") == "a") & (F.col("id") == 1)) \
            .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).head()[0]
        assert a == "2024-01-02 10:00:00"


class TestHashAttribute:
    def test_bucket_range_and_determinism(self, spark, tracks):
        out = hash_attribute(tracks, attribute="trk", modulo=7)
        rows = out.select("trk", "hash").distinct().collect()
        assert all(0 <= r.hash < 7 for r in rows)
        # same value -> same bucket
        assert len({(r.trk, r.hash) for r in rows}) == 3
        again = hash_attribute(tracks, attribute="trk", modulo=7)
        assert sorted(map(tuple, again.select("trk", "hash").distinct()
                          .collect())) == sorted(map(tuple, rows))

    def test_null_hashes_as_empty(self, spark):
        df = spark.createDataFrame([(None,), ("x",)], "v string")
        out = hash_attribute(df, attribute="v", modulo=100)
        null_hash = [r.hash for r in out.collect()
                     if r.v is None][0]
        assert null_hash == 0  # empty-string fold

    def test_color_palette(self, spark, tracks):
        out = hash_attribute_color(tracks, attribute="trk", modulo=7)
        assert all(r.hash.startswith("#") and len(r.hash) == 7
                   for r in out.collect())


class TestRouteSearch:
    """RouteSearchProcess semantics (RouteSearchProcess.scala:244-258):
    dwithin buffer, closest in-buffer segment, compass-corrected heading
    match with the optional bidirectional reciprocal."""

    @pytest.fixture()
    def route(self):
        # one straight eastbound route along the equator
        return [[(0.0, 0.0), (10.0, 0.0), (20.0, 0.0)]]

    def _pts(self, spark, rows):
        from pyspark.sql import types as T
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("heading", T.DoubleType())])
        return spark.createDataFrame(rows, schema)

    def test_buffer_and_heading_filters(self, spark, route):
        from geomesa_spark.operators.processes import route_search
        pts = self._pts(spark, [
            (1, 5.0, 0.5, 90.0),    # near, heading east (route bearing) -> in
            (2, 5.0, 0.5, 270.0),   # near, heading west -> out (unidirectional)
            (3, 5.0, 0.5, 0.0),     # near, heading north -> out
            (4, 5.0, 30.0, 90.0),   # ~3300 km away -> out
        ])
        out = route_search(pts, route, buffer_m=200_000.0,
                           heading_threshold=30.0, id_col="id")
        assert sorted(r.id for r in out.collect()) == [1]

    def test_bidirectional_accepts_reciprocal(self, spark, route):
        from geomesa_spark.operators.processes import route_search
        pts = self._pts(spark, [(2, 5.0, 0.5, 270.0)])
        out = route_search(pts, route, buffer_m=200_000.0,
                           heading_threshold=30.0, id_col="id",
                           bidirectional=True)
        assert [r.id for r in out.collect()] == [2]

    def test_closest_segment_wins(self, spark):
        from geomesa_spark.operators.processes import route_search
        # route turns north at lon 10: east segment then north segment
        route = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]]
        # point near the NORTH leg, heading north -> matches seg 1
        pts = self._pts(spark, [(1, 10.2, 5.0, 0.0)])
        out = route_search(pts, route, buffer_m=200_000.0,
                           heading_threshold=20.0, id_col="id")
        rows = out.collect()
        assert len(rows) == 1 and rows[0].seg == 1
        # same point heading east no longer matches (closest seg is north)
        out2 = route_search(pts, route, buffer_m=200_000.0,
                            heading_threshold=20.0, id_col="id")
        assert [r.id for r in out2.collect()] == [1]
        east = self._pts(spark, [(2, 10.2, 5.0, 90.0)])
        assert route_search(east, route, buffer_m=200_000.0,
                            heading_threshold=20.0,
                            id_col="id").count() == 0

    def test_compass_wraparound(self, spark):
        from geomesa_spark.operators.processes import route_search
        # westbound route -> bearing 270; heading 350 is 80 deg off,
        # heading 280 is 10 deg off; wrap test: bearing ~0 route
        route = [[(5.0, 80.0), (5.0, 85.0)]]  # northbound, bearing 0
        pts = self._pts(spark, [
            (1, 5.5, 82.0, 355.0),  # 5 deg off through the 0/360 wrap
            (2, 5.5, 82.0, 20.0),   # 20 deg off
        ])
        out = route_search(pts, route, buffer_m=300_000.0,
                           heading_threshold=10.0, id_col="id")
        assert sorted(r.id for r in out.collect()) == [1]

    def test_multi_route_picks_nearest(self, spark):
        from geomesa_spark.operators.processes import route_search
        routes = [[(0.0, 0.0), (10.0, 0.0)],   # equator, bearing 90
                  [(0.0, 5.0), (10.0, 5.0)]]   # lat 5, bearing ~90
        pts = self._pts(spark, [(1, 5.0, 4.0, 90.0)])
        out = route_search(pts, routes, buffer_m=2_000_000.0,
                           heading_threshold=45.0, id_col="id")
        rows = out.collect()
        assert len(rows) == 1 and rows[0].route_id == 1

    def test_zero_length_segment_safe(self, spark):
        from geomesa_spark.operators.processes import route_search
        route = [[(5.0, 0.0), (5.0, 0.0), (10.0, 0.0)]]
        # degenerate seg 0 ties with seg 1 at the shared endpoint; the
        # (route_id, seg) tie-break picks seg 0, whose bearing is 0
        pts = self._pts(spark, [(1, 5.0, 0.5, 0.0)])
        out = route_search(pts, route, buffer_m=200_000.0,
                           heading_threshold=45.0, id_col="id")
        rows = out.collect()
        assert len(rows) == 1 and rows[0].seg == 0
