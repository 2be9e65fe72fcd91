"""Tests for the round-5 pipeline additions: deterministic stratified
sampling (source reweighting) and benchmark decontamination."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "en", "the quick brown fox jumps over the lazy dog"),
        (1, "en", "the cat sat on the mat all day long today"),
        (2, "de", "der hund ist nicht der gleiche wie die katze"),
        (3, "es", "el perro y la gata viven en la casa"),
        (4, "fr", "le chien et le chat sont dans la maison"),
        (5, "zh", "corpus row five"),
    ] + [(i, "en", f"filler doc number {i} with some shared words")
         for i in range(6, 106)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestStratifiedSample:
    def test_rate_bounds(self, docs):
        from geomesa_spark.operators.sampling import stratified_sample
        n = docs.count()
        all_kept = stratified_sample(
            docs, strata="lang", rates={}, key="doc_id", default_rate=1.0)
        none_kept = stratified_sample(
            docs, strata="lang", rates={}, key="doc_id", default_rate=0.0)
        assert all_kept.count() == n
        assert none_kept.count() == 0

    def test_per_stratum_rates_apply(self, docs):
        from geomesa_spark.operators.sampling import stratified_sample
        out = stratified_sample(
            docs, strata="lang", rates={"en": 1.0}, key="doc_id",
            default_rate=0.0)
        langs = {r["lang"] for r in out.collect()}
        assert langs == {"en"}
        assert out.count() == docs.where("lang = 'en'").count()

    def test_deterministic_and_layout_independent(self, docs):
        """Same rows on every run and under any partitioning — the
        property DataFrame.sample does NOT have."""
        from geomesa_spark.operators.sampling import stratified_sample
        kw = dict(strata="lang", rates={"en": 0.4, "de": 1.0},
                  key="doc_id", default_rate=0.5, salt=7)
        a = {r["doc_id"] for r in stratified_sample(docs, **kw).collect()}
        b = {r["doc_id"]
             for r in stratified_sample(docs.repartition(13), **kw).collect()}
        assert a == b and 0 < len(a) < docs.count()

    def test_salt_draws_independent_samples(self, docs):
        from geomesa_spark.operators.sampling import stratified_sample
        kw = dict(strata="lang", rates={}, key="doc_id", default_rate=0.5)
        a = {r["doc_id"]
             for r in stratified_sample(docs, salt=1, **kw).collect()}
        b = {r["doc_id"]
             for r in stratified_sample(docs, salt=2, **kw).collect()}
        assert a != b

    def test_multiplicative_hash_matches_python(self, docs):
        """The oracle-parity hash is bit-exact vs a pure-python replica."""
        from geomesa_spark.operators.sampling import (
            KNUTH_A, stratified_sample, unit_hash_multiplicative)
        rate, scale = 0.37, 1 << 32
        out = stratified_sample(
            docs, strata="lang", rates={}, key="doc_id", default_rate=rate,
            unit_hash=unit_hash_multiplicative(F.col("doc_id")))
        got = {r["doc_id"] for r in out.collect()}
        want = {i for (i,) in docs.select("doc_id").collect()
                if (i * KNUTH_A) % scale < int(rate * scale)}
        assert got == want

    def test_invalid_rate_raises(self, docs):
        from geomesa_spark.operators.sampling import stratified_sample
        with pytest.raises(ValueError):
            stratified_sample(docs, strata="lang", rates={"en": 1.5},
                              key="doc_id")

    def test_plan_is_single_narrow_stage(self, docs):
        """No shuffle: the decision is a filter over the scan."""
        from geomesa_spark.operators.sampling import stratified_sample
        out = stratified_sample(docs, strata="lang", rates={"en": 0.5},
                                key="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestContaminationOverlap:
    def test_known_overlap_exact(self, spark):
        from geomesa_spark.text.dedup import contamination_overlap
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta")],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma epsilon zeta"),   # shares 1 of 3
             (2, "zeta eta theta iota kappa"),       # shares 0
             (3, "alpha beta gamma delta prime")],   # shares 2 of 3
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                contamination_overlap(corpus, bench,
                                      flag_ratio=0.5).collect()}
        assert set(rows) == {1, 3}  # doc 2 has no shared shingle
        assert rows[1]["n_shared"] == 1 and rows[1]["n_shingles"] == 3
        assert rows[3]["n_shared"] == 2 and rows[3]["n_shingles"] == 3
        assert not rows[1]["flagged"] and rows[3]["flagged"]

    def test_short_docs_use_whole_text_shingle(self, spark):
        from geomesa_spark.text.dedup import contamination_overlap
        bench = spark.createDataFrame([(9, "tiny doc")],
                                      "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "tiny doc"), (2, "other doc")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                contamination_overlap(corpus, bench).collect()}
        assert set(rows) == {1}
        assert rows[1]["n_shared"] == 1 and rows[1]["ratio"] == 1.0

    def test_null_text_never_contaminates(self, spark):
        """NULL text drops on both sides (SQL-engine parity: a NULL
        shingle never equi-joins); empty strings still match each other."""
        from geomesa_spark.text.dedup import contamination_overlap
        bench = spark.createDataFrame([(9, None), (10, "")],
                                      "doc_id long, text string")
        corp = spark.createDataFrame(
            [(1, None), (2, ""), (3, "x y")], "doc_id long, text string")
        rows = contamination_overlap(corp, bench).collect()
        assert [r["doc_id"] for r in rows] == [2]

    def test_plan_broadcasts_benchmark(self, spark):
        """The benchmark shingle set must broadcast (never shuffle the
        exploded corpus shingles), leaving one corpus-sized exchange —
        the per-doc partial aggregation."""
        from geomesa_spark.text.dedup import contamination_overlap
        bench = spark.createDataFrame([(9, "a b c d e")],
                                      "doc_id long, text string")
        corpus = spark.createDataFrame([(1, "a b c x y")],
                                       "doc_id long, text string")
        plan = contamination_overlap(corpus, bench)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan
