"""Tests for the distributed training-shard packing operator."""

import pytest
from pyspark.sql import Window, functions as F


def _naive(spark, rows, shard_tokens):
    """The single-partition running-sum reference."""
    out, cum = {}, 0
    for key, tok in sorted(rows):
        out[key] = (cum, cum // shard_tokens, cum % shard_tokens)
        cum += tok
    return out


@pytest.fixture(scope="module")
def rows():
    # gaps in the order key, bucket-boundary straddles, zero-token docs
    import random
    rng = random.Random(42)
    keys = sorted(rng.sample(range(0, 5000), 400))
    return [(k, rng.choice([0, 1, 3, 17, 120, 1000])) for k in keys]


def test_matches_naive_prefix_sum(spark, rows):
    from geomesa_spark.operators.packing import shard_pack
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long") \
        .repartition(7)
    got = {r["doc_id"]: (r["global_start"], r["shard_id"], r["shard_offset"])
           for r in shard_pack(df, tokens_col="n_tokens",
                               order_col="doc_id", shard_tokens=256,
                               bucket_size=64).collect()}
    assert got == _naive(spark, rows, 256)


def test_bucket_size_does_not_change_result(spark, rows):
    from geomesa_spark.operators.packing import shard_pack
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    outs = []
    for bs in (1, 64, 1 << 20):  # 1 = one bucket per key; 2^20 = one bucket
        outs.append(sorted(
            (r["doc_id"], r["global_start"])
            for r in shard_pack(df, tokens_col="n_tokens",
                                order_col="doc_id", shard_tokens=100,
                                bucket_size=bs).collect()))
    assert outs[0] == outs[1] == outs[2]


def test_offsets_within_budget_and_monotone(spark, rows):
    from geomesa_spark.operators.packing import shard_pack
    out = shard_pack(spark.createDataFrame(rows, "doc_id long, n_tokens long"),
                     tokens_col="n_tokens", order_col="doc_id",
                     shard_tokens=512, bucket_size=128) \
        .orderBy("doc_id").collect()
    assert all(0 <= r["shard_offset"] < 512 for r in out)
    starts = [r["global_start"] for r in out]
    assert starts == sorted(starts)
    shard_ids = [r["shard_id"] for r in out]
    assert shard_ids == sorted(shard_ids)


def test_invalid_budget_raises(spark, rows):
    from geomesa_spark.operators.packing import shard_pack
    with pytest.raises(ValueError):
        shard_pack(spark.createDataFrame(rows[:3],
                                         "doc_id long, n_tokens long"),
                   tokens_col="n_tokens", order_col="doc_id",
                   shard_tokens=0)


def test_corpus_window_is_partitioned(spark, rows):
    """The corpus-sized window must partition by bucket; the only
    single-partition exchange allowed is the tiny bucket-totals frame."""
    from geomesa_spark.operators.packing import shard_pack
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    plan = shard_pack(df, tokens_col="n_tokens", order_col="doc_id",
                      shard_tokens=256, bucket_size=64)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("SinglePartition") <= 1
    assert "windowspecdefinition(_bkt" in plan
