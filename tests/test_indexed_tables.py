"""Plan-shape proofs for the persisted write-time index tables: the
driver queries must prune STORED columns (partition filters + pushed
row-group predicates) with no per-query cell recomputation — the
reference's toIndexKey-at-write / scan-ranges-at-read split
(Z2IndexKeySpace.scala:46-73, XZ2Index.scala)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "16384")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as e
    e.warm_index_tables(spark, SF)
    return e


class TestStoredXZ2:
    def test_no_python_eval_in_query_plan(self, spark, entry):
        plan = _plan(spark, entry.q_xz2_bbox(spark, SF))
        assert "EvalPython" not in plan  # codes are read, not recomputed

    def test_range_predicates_pushed_to_scan(self, spark, entry):
        plan = _plan(spark, entry.q_xz2_bbox(spark, SF))
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "xz2" in pushed  # sargable BETWEEN terms reach parquet

    def test_files_sorted_by_code(self, spark, entry):
        idx = entry._events_xz2_table(spark, SF)
        # range partitioning: per-file min/max must not all overlap —
        # spot-check that whole-table min/max are split across files
        import pyarrow.parquet as pq
        files = [f for f in idx.inputFiles() if f.endswith(".parquet")]
        assert len(files) > 1
        spans = []
        for f in files:
            md = pq.ParquetFile(f.replace("file:", "")).metadata
            cols = {md.schema.column(i).name: i
                    for i in range(md.num_columns)}
            st = md.row_group(0).column(cols["xz2"]).statistics
            spans.append((st.min, st.max))
        spans.sort()
        overlaps = sum(1 for a, b in zip(spans, spans[1:])
                       if b[0] <= a[1])
        assert overlaps <= len(spans) // 2  # mostly disjoint code ranges


class TestStoredXZ3:
    def test_epoch_partition_pruned(self, spark, entry):
        plan = _plan(spark, entry.q_xz3_bbox_time(spark, SF))
        assert "PartitionFilters: [" in plan
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "epoch" in pf
        assert "EvalPython" not in plan

    def test_dedupe_by_id_preserves_multiplicity(self, spark):
        # ADVICE regression: two distinct rows with identical values must
        # both survive when an id column is given
        from geomesa_spark.operators.xz3_query import with_xz3, xz3_query
        rows = [(1, 0.0, 0.0, 1.0, 1.0, "2024-01-08T01:00:00",
                 "2024-01-08T02:00:00"),
                (2, 0.0, 0.0, 1.0, 1.0, "2024-01-08T01:00:00",
                 "2024-01-08T02:00:00")]
        df = spark.createDataFrame(
            rows, "id long, xmin double, ymin double, xmax double, "
                  "ymax double, t0 string, t1 string") \
            .withColumn("t0", F.to_timestamp("t0")) \
            .withColumn("t1", F.to_timestamp("t1"))
        idx = with_xz3(df.drop("id").withColumn("id", F.col("xmin") * 0
                                                + F.lit(0)))
        # identical values, no id -> collapses (documented caveat)
        out_all = xz3_query(with_xz3(df.drop("id")),
                            (-10.0, -10.0, 10.0, 10.0),
                            1704672000.0, 1705276800.0)
        assert out_all.count() == 1
        # with the id column both rows survive
        out_id = xz3_query(with_xz3(df), (-10.0, -10.0, 10.0, 10.0),
                           1704672000.0, 1705276800.0, id_col="id")
        assert out_id.count() == 2


class TestStoredS2:
    def test_partition_and_rowgroup_prune(self, spark, entry):
        plan = _plan(spark, entry.q_s2_bbox_query(spark, SF))
        assert "PartitionFilters: [" in plan
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "cell_prefix" in pf  # Z2 layout partition prune
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "s2" in pushed  # stored S2 column prunes row groups
        assert "EvalPython" not in plan  # no per-query cell recompute


class TestStoredLSH:
    def test_bucket_partition_pruned_no_corpus_explode(self, spark,
                                                       entry):
        df = entry.q_lsh_topk(spark, SF)
        plan = _plan(spark, df)
        # the capped layout prunes partitions on pt and pushes the bk
        # literals to parquet row-group stats (files are bk-sorted)
        pfs = [seg.split("]", 1)[0]
               for seg in plan.split("PartitionFilters: [")[1:]]
        assert any("pt" in pf for pf in pfs), pfs
        pushed = [seg.split("]", 1)[0]
                  for seg in plan.split("PushedFilters: [")[1:]]
        assert any("bk" in pd for pd in pushed), pushed
        # signature recompute over the corpus would appear as an
        # ArrowEvalPython over the embeddings scan feeding the bucket
        # join, and the ad-hoc path's x n_tables corpus explode as a
        # Generate over that scan; the indexed plan has NO Python eval
        # at all (probes are driver-side numpy, the cosine is a Catalyst
        # zip_with/aggregate fold) and no corpus-side explode
        assert plan.count("ArrowEvalPython") == 0
        assert "Generate explode" not in plan

    def test_indexed_matches_adhoc(self, spark, entry):
        from geomesa_spark.ml.similarity import (lsh_topk,
                                                 lsh_topk_indexed)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").cast("string").alias("query_id"),
            "embedding")
        index, meta = entry._lsh_index_table(spark, SF)
        a = lsh_topk_indexed(index, emb, queries, 5,
                             n_planes=meta["n_planes"],
                             n_tables=meta["n_tables"], multiprobe=1,
                             bucket_partitions=meta["bucket_partitions"],
                             meta=meta)
        b = lsh_topk(emb, queries, 5, n_planes=meta["n_planes"],
                     n_tables=meta["n_tables"], multiprobe=1)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb

    def test_meta_sidecar_rejects_mismatched_build_params(self, spark,
                                                          entry):
        from geomesa_spark.ml.similarity import lsh_topk_indexed
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").cast("string").alias("query_id"),
            "embedding")
        index, meta = entry._lsh_index_table(spark, SF)
        assert meta is not None and "bucket_partitions" in meta
        # a wrong pt modulus would silently exclude candidate buckets —
        # the sidecar turns that into a hard error
        with pytest.raises(ValueError, match="bucket_partitions"):
            lsh_topk_indexed(
                index, emb, queries, 5, n_planes=6, n_tables=8,
                bucket_partitions=meta["bucket_partitions"] * 2,
                meta=meta)

    def test_empty_query_set_yields_empty_result(self, spark, entry):
        from geomesa_spark.ml.similarity import lsh_topk_indexed
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        none = emb.where(F.lit(False)).select(
            F.col("vec_id").cast("string").alias("query_id"),
            "embedding")
        index, meta = entry._lsh_index_table(spark, SF)
        out = lsh_topk_indexed(index, emb, none, 5,
                               n_planes=meta["n_planes"],
                               n_tables=meta["n_tables"],
                               bucket_partitions=meta["bucket_partitions"],
                               meta=meta)
        assert out.count() == 0
