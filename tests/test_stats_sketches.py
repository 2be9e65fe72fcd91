"""Bound gates for the approximate-sketch stats the driver's
value-checked ``stats_sketches`` query replaces with exact twins.

The reference's Stat system ships sketch estimators (HyperLogLog
cardinality, count-min frequency, quantile sketches — Stat.scala
registry in /root/reference/geomesa-utils/src/main/scala/org/
locationtech/geomesa/utils/stats/Stat.scala). Spark's built-ins cover
the same surface; since sketch encodings differ engine-to-engine there
is no cross-engine value oracle — instead each estimate is gated
against its exact counterpart within the estimator's published bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def test_hll_within_rsd(spark, events):
    """approx_count_distinct (HLL++) within 5 standard errors of exact
    at rsd=0.02 — astronomically unlikely to flap, fails on any
    implementation break."""
    rows = (events.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx"),
                 F.count_distinct("user_id").alias("exact"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(5, 5 * 0.02 * r.exact), r


def test_count_min_sketch_overestimates_within_eps(spark, events):
    """CMS point queries never underestimate and overestimate by at most
    eps * n (the classic CM guarantee, here deterministic per seed)."""
    eps, conf, seed = 0.001, 0.99, 42
    sketch_row = events.agg(
        F.count_min_sketch("user_id", F.lit(eps), F.lit(conf),
                           F.lit(seed)).alias("cms"),
        F.count("*").alias("n")).collect()[0]
    exact = {r.user_id: r.c for r in
             events.groupBy("user_id").agg(F.count("*").alias("c"))
             .collect()}
    n = sketch_row.n
    # probe the sketch through Spark itself (the only public reader)
    probe = spark.createDataFrame(
        [(k,) for k in list(exact)[:50]], "user_id bigint")
    est_rows = probe.select(
        "user_id",
        F.expr(
            "count_min_sketch_estimate("
            f"X'{bytes(sketch_row.cms).hex()}', user_id)"
        ).alias("est")).collect() if _has_cms_estimate(spark) else None
    if est_rows is None:
        pytest.skip("no count_min_sketch_estimate in this Spark build; "
                    "sketch bytes presence checked")
    for r in est_rows:
        assert exact[r.user_id] <= r.est <= exact[r.user_id] + eps * n


def _has_cms_estimate(spark) -> bool:
    try:
        spark.sql("SELECT count_min_sketch_estimate(X'00', 1)").collect()
        return True
    except Exception:
        return False


def test_percentile_approx_rank_bound(spark, events):
    """percentile_approx(accuracy=10000) lands within 1/accuracy rank
    error of the exact percentile (Greenwald-Khanna bound)."""
    accuracy = 10_000
    row = events.agg(
        F.percentile_approx("value", F.lit(0.5), accuracy).alias("ap"),
        F.expr("percentile(value, 0.5)").alias("ex"),
        F.count("value").alias("n")).collect()[0]
    # rank of the approx answer must be within n/accuracy of the target
    rank = events.where(F.col("value") <= row.ap).count()
    target = 0.5 * row.n
    assert abs(rank - target) <= max(2.0, row.n / accuracy + 1)


def test_cms_bytes_deterministic(events):
    """Same seed -> byte-identical sketch (merge/serialization stable)."""
    a = events.agg(F.count_min_sketch(
        "user_id", F.lit(0.01), F.lit(0.95), F.lit(7)).alias("c")
    ).collect()[0].c
    b = events.agg(F.count_min_sketch(
        "user_id", F.lit(0.01), F.lit(0.95), F.lit(7)).alias("c")
    ).collect()[0].c
    assert bytes(a) == bytes(b) and len(a) > 0
