"""Plan-shape assertions (the reference's pushdown test pattern,
SparkSQLDataTest.scala:161-243): prove the physical plans are the ones a
100 TB deployment needs — broadcasts actually broadcast, cell math stays
in codegen, scans prune partitions and columns, aggregates have map-side
partial phases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as e
    return e


class TestJoinPlans:
    def test_spatial_join_broadcasts_regions(self, spark, entry):
        df = entry.q_spatial_join_contains(spark, SF)
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        # the big point side must NOT be exchanged before the join
        join_part = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in join_part

    def test_attribute_join_is_broadcast_or_smj(self, spark, entry):
        plan = _plan(entry.q_join_pushdown(spark, SF))
        assert "Join" in plan

    def test_knn_candidates_use_native_cells(self, spark, entry):
        # q_knn's rounds materialize eagerly (localCheckpoint per ring
        # scan), so assert on the per-round candidate plan directly: the
        # cell column must be native bit math and the query frame must
        # broadcast against the unshuffled point side
        from geomesa_spark.cells import PARTITION_RES
        from geomesa_spark.operators.knn import (_cell_expr,
                                                 _round_candidates)
        pts = entry._events_points(spark, SF).withColumn(
            "__pc__", _cell_expr("lon", "lat", PARTITION_RES))
        qdf = spark.createDataFrame(
            [("q", 0.0, 0.0, 0)],
            "query_id string, qlon double, qlat double, cell long")
        plan = _plan(_round_candidates(pts, qdf, "lon", "lat", "__pc__",
                                       has_prefix=False))
        assert "shiftleft" in plan or "shiftright" in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        join_part = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in join_part


class TestCodegen:
    def test_cell_assignment_tiles_no_python(self, spark):
        from geomesa_spark.operators.tiles import tile_counts
        from geomesa_spark.raster.fixtures import images_df
        plan = _plan(tile_counts(images_df(spark, 100)))
        # tile assignment + count: only the fixture synth is Python
        after_synth = plan.split("MapInPandas")[0]
        assert "ArrowEvalPython" not in after_synth
        assert "BatchEvalPython" not in plan

    def test_density_is_pure_jvm(self, spark, entry):
        plan = _plan(entry.q_density_grid(spark, SF))
        assert "EvalPython" not in plan
        # partial/final hash aggregate = the AggregatingScan shape
        assert plan.count("HashAggregate") >= 2

    def test_z3_heatmap_is_pure_jvm(self, spark, entry):
        plan = _plan(entry.q_z3_heatmap(spark, SF))
        assert "EvalPython" not in plan


class TestAggregates:
    def test_partial_final_hash_aggregate(self, spark, entry):
        plan = _plan(entry.q_unique_values(spark, SF))
        # map-side partial agg before the exchange (AggregatingScan shape)
        assert plan.count("HashAggregate") >= 2

    def test_topk_single_shuffle(self, spark, entry):
        plan = _plan(entry.q_topk_per_key(spark, SF))
        assert "Window" in plan


class TestScanPushdown:
    def test_column_pruning_reaches_scan(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        plan = _plan(ev.select("event_id"))
        assert "ReadSchema: struct<event_id:bigint>" in plan

    def test_filter_pushdown_reaches_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        plan = _plan(li.where(F.col("l_quantity") > 40.0)
                     .select("l_orderkey"))
        assert "PushedFilters: [IsNotNull(l_quantity), " \
               "GreaterThan(l_quantity,40.0)]" in plan

    def test_bytes_column_not_scanned_for_tiles(self, spark, tmp_path):
        """The heavy image payload must not be read for tile counting."""
        from geomesa_spark.operators.tiles import tile_counts
        from geomesa_spark.sources.table import ingest_images, read_images
        path = str(tmp_path / "t")
        ingest_images(spark, path, n=50, chunk_rows=50,
                      partitions_per_chunk=2)
        imgs = read_images(spark, path)
        plan = _plan(tile_counts(imgs.select("lon", "lat", "image_id")))
        read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
        assert "bytes" not in read_schema


class TestClassifiedCover:
    """cell_cover_classified: interior cells are PROVABLY all-'I' (the
    contained-range shortcut), boundary cells carry the geometry edge."""

    def test_interior_cells_are_strictly_inside(self, spark):
        import numpy as np

        from geomesa_spark.cells.z2 import cell_bounds
        from geomesa_spark.geo.model import Polygon
        from geomesa_spark.operators.join import locate_points_in_geometry
        from geomesa_spark.plans.planner import cell_cover_classified

        # concave polygon with a diagonal edge crossing many res-6 cells
        poly = Polygon([[-60.0, -30.0], [60.0, -30.0], [60.0, 40.0],
                        [0.0, 5.0], [-60.0, 40.0], [-60.0, -30.0]])
        cells, interior = cell_cover_classified(poly, res=6)
        assert interior.any() and (~interior).any()
        x0, y0, x1, y1 = cell_bounds(cells, 6)
        rng = np.random.default_rng(7)
        for i in np.flatnonzero(interior):
            xs = rng.uniform(x0[i], x1[i], 50)
            ys = rng.uniform(y0[i], y1[i], 50)
            # corners included: closed-rect claim
            xs = np.concatenate([xs, [x0[i], x1[i], x0[i], x1[i]]])
            ys = np.concatenate([ys, [y0[i], y0[i], y1[i], y1[i]]])
            assert (locate_points_in_geometry(xs, ys, poly) == 1).all()

    def test_boundary_point_via_interior_shortcut_join(self, spark):
        from geomesa_spark.geo.io import to_wkb
        from geomesa_spark.geo.model import Polygon
        from geomesa_spark.operators.join import spatial_join

        # region aligned to res-4 cell edges: its boundary lies ON cell
        # borders; boundary points must NOT be accepted by st_contains
        poly = Polygon([[-45.0, -22.5], [45.0, -22.5], [45.0, 22.5],
                        [-45.0, 22.5], [-45.0, -22.5]])
        regions = spark.createDataFrame(
            [("r", bytearray(to_wkb(poly)))], "region_id string, geom binary")
        pts = spark.createDataFrame(
            [(1, 0.0, 0.0),        # interior
             (2, -45.0, 0.0),      # on boundary
             (3, 0.0, 22.5),       # on boundary
             (4, 100.0, 0.0)],     # outside
            "id long, lon double, lat double")
        got = spatial_join(pts, regions, predicate="st_contains",
                           broadcast_regions=True)
        assert sorted(r.id for r in got.collect()) == [1]
        cov = spatial_join(pts, regions, predicate="st_covers",
                          broadcast_regions=True)
        assert sorted(r.id for r in cov.collect()) == [1, 2, 3]
