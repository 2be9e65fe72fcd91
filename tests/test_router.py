"""ANN strategy routing (ml/router.py): cost-model decisions at
fixture and extrapolated corpus shapes, and end-to-end dispatch
equivalence.

StrategyDecider parity for the ANN family (reference:
geomesa-index-api/.../planning/StrategyDecider.scala:79-191 —
cheapest proposed strategy wins, re-derived not ported)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.ml.router import (ann_topk_routed, decide_ann,
                                     ivf_candidates, lsh_candidates)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").cast("string").alias("query_id"), "embedding")


class TestCandidateEstimates:
    def test_lsh_caps_at_full_scan(self):
        # more probe masks than buckets: the degenerate all-bucket
        # regime can't claim fewer candidates than exhaustive
        rows = lsh_candidates(1000, 10, n_planes=4, n_tables=8,
                              multiprobe=2)  # 137 masks > 16 buckets
        assert rows == 10 * 1000

    def test_lsh_scales_with_occupancy(self):
        # 2^10 buckets, 11 masks (identity + 10 bit-flips), 1 table:
        # 11/1024 of the corpus
        rows = lsh_candidates(1 << 20, 1, n_planes=10, n_tables=1,
                              multiprobe=1)
        assert rows == (1 << 20) * 11 // 1024

    def test_ivf_probe_fraction(self):
        assert ivf_candidates(10_000, 5, n_centroids=100, nprobe=4) \
            == 5 * 4 * 100
        # nprobe >= n_centroids degenerates to a full scan
        assert ivf_candidates(10_000, 5, n_centroids=3, nprobe=8) \
            == 5 * 10_000


class TestDecision:
    LSH_META = {"n_planes": 9, "n_tables": 8, "dim": 64, "seed": 11,
                "bucket_partitions": 16}
    IVF_META = {"n_centroids": 100, "dim": 64, "seed": 11,
                "list_partitions": 16}

    def test_sf01_shape_routes_exact(self):
        # the measured sf0.1 shape (2k vectors, 40 queries, p=6 sidecar):
        # measured exact 0.69 s vs IVF 1.40 vs LSH 2.78
        lsh = dict(self.LSH_META, n_planes=6)
        ivf = dict(self.IVF_META, n_centroids=45)
        s = decide_ann(2_000, 40, lsh_meta=lsh, ivf_meta=ivf,
                       multiprobe=2, nprobe=4)
        assert s.kind == "exact"

    def test_sf05_shape_routes_exact(self):
        # the measured sf0.5 shape (10k vectors, 200 queries): the r4
        # VERDICT regime — multiprobe covers every bucket, exact (0.94 s)
        # must win over the stored LSH index (7.46 s)
        s = decide_ann(10_000, 200, lsh_meta=self.LSH_META,
                       ivf_meta=self.IVF_META, multiprobe=2, nprobe=4)
        assert s.kind == "exact"

    def test_sf1_shape_crosses_to_ivf(self):
        # the measured sf1.0 crossover (20k vectors, 400 queries): IVF
        # 2.42 s beat exact 4.37 s (BENCH_SF1_LOCAL.json) — the router
        # must follow the measurement
        lsh = dict(self.LSH_META, n_planes=10)
        ivf = dict(self.IVF_META, n_centroids=141)
        s = decide_ann(20_000, 400, lsh_meta=lsh, ivf_meta=ivf,
                       multiprobe=2, nprobe=4)
        assert s.kind == "ivf"

    def test_large_corpus_routes_ivf(self):
        # 10^7 vectors, sqrt(n) lists: the pruned scan's row savings
        # dwarf the fixed plan overhead — the regime indexes exist for
        ivf = dict(self.IVF_META, n_centroids=3163)
        lsh = dict(self.LSH_META, n_planes=16)
        s = decide_ann(10_000_000, 200, lsh_meta=lsh, ivf_meta=ivf,
                       multiprobe=2, nprobe=4)
        assert s.kind == "ivf"
        assert s.candidates < 200 * 10_000_000 // 100

    def test_large_corpus_lsh_only(self):
        # no IVF index built: single-probe LSH beats exhaustive at 10^8
        lsh = dict(self.LSH_META, n_planes=16)
        s = decide_ann(100_000_000, 200, lsh_meta=lsh, multiprobe=1)
        assert s.kind == "lsh"

    def test_no_indexes_always_exact(self):
        s = decide_ann(10_000_000_000, 10)
        assert s.kind == "exact"

    def test_empty_query_set(self):
        s = decide_ann(10_000, 0, lsh_meta=self.LSH_META,
                       ivf_meta=self.IVF_META)
        assert s.kind == "exact" and s.candidates == 0


class TestRoutedDispatch:
    def test_fixture_routes_exact_and_matches_brute_force(
            self, spark, entry, emb, queries):
        from geomesa_spark.ml.similarity import cosine_topk
        lsh_index, lsh_meta = entry._lsh_index_table(spark, SF)
        ivf_index, cents, ivf_meta = entry._ivf_index_table(spark, SF)
        n, q = emb.count(), queries.count()
        assert decide_ann(n, q, lsh_meta=lsh_meta, ivf_meta=ivf_meta,
                          multiprobe=2, nprobe=4).kind == "exact"
        routed = ann_topk_routed(
            emb, queries, 10, lsh=(lsh_index, lsh_meta),
            ivf=(ivf_index, cents, ivf_meta), multiprobe=2, nprobe=4,
            n_rows=n, n_queries=q)
        exact = cosine_topk(emb, queries, 10)
        assert sorted(map(tuple, routed.collect())) \
            == sorted(map(tuple, exact.collect()))

    def test_forced_ivf_dispatch_matches_indexed_path(
            self, spark, entry, emb, queries, monkeypatch):
        # the fixture sidecar (22 lists over 500 rows) can never
        # cost-favor IVF, so force the decision to exercise the
        # dispatch arm: it must return exactly ivf_topk_indexed's result
        import geomesa_spark.ml.router as R
        from geomesa_spark.ml.ivf import ivf_topk_indexed
        ivf_index, cents, ivf_meta = entry._ivf_index_table(spark, SF)
        monkeypatch.setattr(R, "decide_ann", lambda *a, **k:
                            R.AnnStrategy("ivf", 0.0, 0, "forced"))
        q5 = queries.limit(5)
        routed = R.ann_topk_routed(
            emb, q5, 10, ivf=(ivf_index, cents, ivf_meta), nprobe=2)
        direct = ivf_topk_indexed(
            ivf_index, q5, 10, nprobe=2, centroids=cents,
            list_partitions=ivf_meta["list_partitions"],
            seed=ivf_meta["seed"], meta=ivf_meta)
        assert sorted(map(tuple, routed.collect())) \
            == sorted(map(tuple, direct.collect()))

    def test_forced_lsh_dispatch_matches_indexed_path(
            self, spark, entry, emb, queries, monkeypatch):
        import geomesa_spark.ml.router as R
        from geomesa_spark.ml.similarity import lsh_topk_indexed
        lsh_index, lsh_meta = entry._lsh_index_table(spark, SF)
        monkeypatch.setattr(R, "decide_ann", lambda *a, **k:
                            R.AnnStrategy("lsh", 0.0, 0, "forced"))
        q5 = queries.limit(5)
        routed = R.ann_topk_routed(
            emb, q5, 10, lsh=(lsh_index, lsh_meta), multiprobe=1)
        direct = lsh_topk_indexed(
            lsh_index, emb, q5, 10, n_planes=lsh_meta["n_planes"],
            n_tables=lsh_meta["n_tables"], dim=lsh_meta["dim"],
            seed=lsh_meta["seed"], multiprobe=1,
            bucket_partitions=lsh_meta["bucket_partitions"],
            meta=lsh_meta)
        assert sorted(map(tuple, routed.collect())) \
            == sorted(map(tuple, direct.collect()))
