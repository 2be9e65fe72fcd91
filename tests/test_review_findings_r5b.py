"""Regression tests for the second round-5 adversarial review batch.

Each test pins one fixed defect:
- coalesce_ranges(max_n=1) returned the input unmerged (negative-zero slice)
- knn_join silently dropped queries that never reached k neighbors before
  max_rounds (window growth never forced to max_radius_m)
- cell_cover_of_geometry re-expanded a budget-coarsened cover back to full
  resolution, defeating the ScanRangesTarget budget with a huge isin list
- osm_way_geometries inflated member counts when the node table carried
  duplicate node ids (overlapping regional extracts), dropping whole ways
- lambda_view crashed when the changelog lacked the optional seq column
"""

import pytest

from pyspark.sql import functions as F


class TestCoalesceRangesBudget:
    def test_max_n_one_merges_everything(self):
        from geomesa_spark.operators.xz2_query import coalesce_ranges
        r = [(0, 5), (10, 20), (100, 110)]
        assert coalesce_ranges(r, 1) == [(0, 110)]

    def test_max_n_two_keeps_widest_gap(self):
        from geomesa_spark.operators.xz2_query import coalesce_ranges
        r = [(0, 5), (10, 20), (100, 110)]
        assert coalesce_ranges(r, 2) == [(0, 20), (100, 110)]

    def test_under_budget_untouched(self):
        from geomesa_spark.operators.xz2_query import coalesce_ranges
        r = [(0, 5), (10, 20)]
        assert coalesce_ranges(r, 4) == r


class TestKnnExhaustionEmits:
    def test_fewer_points_than_k_still_answered(self, spark):
        """3 points total, k=5: the query must come back with all 3
        confirmed neighbors instead of vanishing from the output."""
        from geomesa_spark.operators.knn import knn_join
        pts = spark.createDataFrame(
            [(1, 0.1, 0.1), (2, -0.2, 0.3), (3, 0.4, -0.1)],
            "id long, lon double, lat double")
        out = knn_join(pts, [("q", 0.0, 0.0)], k=5,
                       estimated_count=3, max_rounds=4).collect()
        assert sorted(r.id for r in out) == [1, 2, 3]
        assert sorted(r.rank for r in out) == [1, 2, 3]

    def test_tight_max_rounds_flush(self, spark):
        """max_rounds=1 can't reach max_radius; the loop-exit flush must
        still emit the confirmed neighbors found in the only round."""
        from geomesa_spark.operators.knn import knn_join
        pts = spark.createDataFrame(
            [(1, 0.01, 0.01), (2, 0.02, 0.0)],
            "id long, lon double, lat double")
        out = knn_join(pts, [("q", 0.0, 0.0)], k=5, estimated_count=2,
                       initial_radius_m=50000.0, max_rounds=1).collect()
        assert sorted(r.id for r in out) == [1, 2]


class TestCoverBudgetHonored:
    def test_huge_reexpansion_returns_no_prune(self):
        """A near-world polygon with a tiny budget: coarsening succeeds
        but re-expanding to partition res would blow the budget by far
        more than the 4x slack -> None (scan + exact refine), never a
        six-figure isin list."""
        from geomesa_spark.geo.model import Polygon
        from geomesa_spark.plans.planner import cell_cover_of_geometry
        near_world = Polygon([[-180.0, -90.0], [180.0, -90.0],
                              [180.0, 89.0], [-180.0, 89.0],
                              [-180.0, -90.0]])
        assert cell_cover_of_geometry(near_world, max_cells=4) is None

    def test_small_query_still_prunes(self):
        from geomesa_spark.geo.model import Polygon
        from geomesa_spark.plans.planner import cell_cover_of_geometry
        small = Polygon([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0],
                         [0.0, 0.0]])
        cover = cell_cover_of_geometry(small)
        assert cover is not None and 0 < len(cover) <= 16


class TestOsmDuplicateNodes:
    def test_duplicated_node_id_does_not_drop_way(self, spark):
        from geomesa_spark.sources.osm import osm_way_geometries
        nodes = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 1.0, 0.0), (1, 0.0, 0.0)],
            "node_id long, lon double, lat double")
        ways = spark.createDataFrame(
            [(10, [1, 2], {"highway": "residential"})],
            "way_id long, refs array<long>, tags map<string,string>")
        out = osm_way_geometries(nodes, ways).collect()
        assert len(out) == 1
        assert out[0].n_points == 2
        assert out[0].geom is not None


class TestIngestExactlyOnceAfterCrash:
    def test_orphaned_chunk_files_are_scrubbed_on_resume(
            self, spark, tmp_path):
        """Simulate a job killed BETWEEN a chunk's data write and its
        lineage commit marker: the resume must not double-count that
        chunk's rows (the orphaned ingest_chunk=c dirs are deleted
        before the re-write)."""
        from pyspark.sql import functions as F
        from geomesa_spark.cells import PARTITION_RES
        from geomesa_spark.cells.native import cell_expr
        from geomesa_spark.sources.table import (
            _images_range, ingest_images, read_images, write_partitioned)
        p = str(tmp_path / "crash")
        # commit chunk 0 normally
        ingest_images(spark, p, n=100, chunk_rows=100,
                      partitions_per_chunk=2)
        # write chunk 1's DATA but no lineage marker (the crash window)
        orphan = (_images_range(spark, 100, 200, 2)
                  .withColumn("cell_prefix",
                              cell_expr("lon", "lat", PARTITION_RES))
                  .withColumn("ingest_chunk", F.lit(1).cast("long"))
                  .repartition("cell_prefix"))
        write_partitioned(orphan, p, mode="append",
                          extra_partition_cols=("ingest_chunk",))
        assert read_images(spark, p).count() == 200  # orphans visible
        # resume: chunk 1 absent from lineage -> re-ingested exactly once
        resumed = ingest_images(spark, p, n=200, chunk_rows=100,
                                partitions_per_chunk=2)
        assert resumed["ingested"] == [1] and resumed["skipped"] == [0]
        df = read_images(spark, p)
        assert df.count() == 200
        assert df.select("image_id").distinct().count() == 200


class TestUpsertCrossBatchSameTs:
    def test_later_batch_same_ts_wins_without_seq(self, spark, tmp_path):
        """Events without a seq column: the synthetic per-batch index
        must not be compared against a PREVIOUS batch's stored index —
        a same-timestamp update arriving in a later micro-batch is the
        last write and must win."""
        import json
        import os
        from geomesa_spark.streaming.upsert import upsert_stream

        schema = ("key string, op string, ts timestamp, lon double, "
                  "lat double, payload string")
        d = str(tmp_path / "in"); ck = str(tmp_path / "ck")
        o = str(tmp_path / "out")
        os.makedirs(d)

        def run():
            src = spark.readStream.schema(schema).json(d)
            q = (upsert_stream(src).writeStream.format("parquet")
                 .option("path", o).option("checkpointLocation", ck)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
            return spark.read.schema(schema).parquet(o)

        ts = "2024-01-01T00:00:05"
        with open(os.path.join(d, "b1.json"), "w") as f:
            f.write(json.dumps({"key": "k", "op": "put", "ts": ts,
                                "lon": 1.0, "lat": 1.0,
                                "payload": "first"}) + "\n")
            f.write(json.dumps({"key": "k", "op": "put", "ts": ts,
                                "lon": 1.0, "lat": 1.0,
                                "payload": "second"}) + "\n")
        run()
        with open(os.path.join(d, "b2.json"), "w") as f:
            f.write(json.dumps({"key": "k", "op": "put", "ts": ts,
                                "lon": 2.0, "lat": 2.0,
                                "payload": "third"}) + "\n")
        out = run()
        payloads = [r.payload for r in
                    out.where(F.col("op") == "upsert")
                       .orderBy("payload").collect()]
        # batch 1 emitted 'second' (intra-batch LWW); batch 2's same-ts
        # arrival is later and must emit 'third', not be dropped as stale
        assert payloads == ["second", "third"]


class TestSharedPartitionerSpec:
    def test_same_spec_same_mapping_across_frames(self, spark):
        """Data-dependent strategies must expose a fit-once/apply-many
        path: the SAME fitted spec maps the same coordinates to the same
        partition id on two different frames (independent fits would
        derive different bin edges)."""
        from geomesa_spark.plans.partitioning import (
            fit_partitioner, partition_id_from_spec)
        a = spark.createDataFrame(
            [(float(i), float(i % 7)) for i in range(-50, 50)],
            "lon double, lat double")
        # b shares some of a's coordinates but has very different
        # bounds/quantiles (an independent fit would bin differently)
        b = spark.createDataFrame(
            [(float(i), float(i % 7)) for i in range(10)]
            + [(1000.0, 3.0)],
            "lon double, lat double")
        for strategy in ("equal", "weighted", "rtree"):
            spec = fit_partitioner(a, strategy=strategy, parallelism=16)
            pid = partition_id_from_spec(spec)
            ma = {(r.lon, r.lat): r.pid for r in
                  a.withColumn("pid", pid).collect()}
            mb = {(r.lon, r.lat): r.pid for r in
                  b.withColumn("pid", pid).collect()}
            shared = set(ma) & set(mb)
            assert shared, f"{strategy}: fixtures must overlap"
            for k in shared:
                assert ma[k] == mb[k], strategy

    def test_spec_roundtrips_through_json(self, spark):
        import json
        from geomesa_spark.plans.partitioning import (
            fit_partitioner, partition_id_from_spec)
        df = spark.createDataFrame(
            [(float(i), float(i % 5)) for i in range(100)],
            "lon double, lat double")
        spec = fit_partitioner(df, strategy="rtree", parallelism=8)
        spec2 = json.loads(json.dumps(spec))
        got = df.withColumn(
            "pid", partition_id_from_spec(spec2)).collect()
        assert all(r.pid >= -1 for r in got)


class TestLambdaViewOptionalSeq:
    def test_log_without_seq_column(self, spark):
        from geomesa_spark.streaming.density import lambda_view
        batch = spark.createDataFrame(
            [("a", 1.0, "batch"), ("b", 1.0, "batch")],
            "key string, ts double, val string")
        log = spark.createDataFrame(
            [("a", "put", 2.0, "stream"), ("c", "put", 2.0, "stream")],
            "key string, op string, ts double, val string")
        rows = {r.key: r.val for r in lambda_view(batch, log).collect()}
        assert rows == {"a": "stream", "b": "batch", "c": "stream"}
