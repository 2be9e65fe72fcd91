"""Tests for the dedup_corpus job: stage materialization, resume, and
keeper semantics over the real sf0.001 documents fixture."""

from __future__ import annotations

import os

from tests.conftest import SF_DIR

DOCS = os.path.join(SF_DIR, "documents.parquet")


def _run(spark, out_dir, **kw):
    from jobs.dedup_corpus import run_dedup
    return run_dedup(spark, DOCS, str(out_dir), **kw)


def test_minhash_job_end_to_end_and_resume(spark, tmp_path):
    out = tmp_path / "minhash"
    m1 = _run(spark, out, method="minhash", threshold=0.5)
    assert m1["docs_in"] == 500
    assert not m1["pairs"]["resumed"]
    # every near-dup pair removes at least one doc; corpus + victims = docs
    assert m1["docs_out"] == m1["docs_in"] - m1["removed"]
    assert m1["removed"] > 0 and m1["n_clusters"] >= 1
    # cluster keepers (comp) all survive; victims all removed
    clusters = spark.read.parquet(str(out / "clusters"))
    corpus_ids = {r.doc_id for r in
                  spark.read.parquet(str(out / "corpus"))
                  .select("doc_id").collect()}
    keepers = {r.comp for r in clusters.select("comp").collect()}
    victims = {r.node for r in
               clusters.where("node != comp").select("node").collect()}
    assert keepers <= corpus_ids
    assert not (victims & corpus_ids)

    # second run resumes every stage with identical row counts
    m2 = _run(spark, out, method="minhash", threshold=0.5)
    for stage in ("pairs", "clusters", "corpus"):
        assert m2[stage]["resumed"], stage
        assert m2[stage]["rows"] == m1[stage]["rows"], stage

    # deleting one stage dir recomputes just that stage downstream
    import shutil
    shutil.rmtree(out / "corpus")
    m3 = _run(spark, out, method="minhash", threshold=0.5)
    assert m3["pairs"]["resumed"] and m3["clusters"]["resumed"]
    assert not m3["corpus"]["resumed"]
    assert m3["docs_out"] == m1["docs_out"]


def test_exact_method_has_no_pair_stage(spark, tmp_path):
    m = _run(spark, tmp_path / "exact", method="exact")
    assert "pairs" not in m
    assert m["docs_out"] == m["docs_in"] - m["removed"]
    # the fixture's near-dups are not byte-identical after normalization,
    # so exact dedup removes nothing (a weaker catch than minhash)
    assert m["removed"] >= 0


def test_unknown_method_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown method"):
        _run(spark, tmp_path / "bad", method="nope")
