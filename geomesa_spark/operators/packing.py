"""Training-shard packing: assign each document a shard id and offset
under a fixed per-shard token budget, in a stable global order.

The last step of a training-data pipeline: after filtering, dedup and
reweighting, the surviving corpus is laid out into fixed-size shards that
trainers stream sequentially. The assignment is a running token count in
corpus order — semantically ``sum(n_tokens) OVER (ORDER BY order_key)`` —
but a bare unpartitioned window in Spark collapses the whole corpus into
ONE task, which is the canonical single-partition scale-killer.

This operator computes the same prefix sum in three distributed steps
(the textbook two-level scan):

1. bucket rows by ``order_key // bucket_size`` and take a PER-BUCKET
   cumulative sum (a window partitioned by bucket — parallel, and the
   shuffle it needs is the only corpus-sized exchange in the plan);
2. aggregate one total per bucket and turn those into exclusive bucket
   prefixes with a window over the tiny bucket-totals frame (n/bucket_size
   rows — at the default 2^20 that is ~10^6 rows for a 10^12-doc corpus);
3. broadcast the prefixes back and add them to the local cumsums.

Because integer division preserves order across buckets, the result is
bit-identical to the single-partition window (the DuckDB oracle twin runs
exactly that), at any parallelism.

Documents that straddle a shard boundary belong to the shard containing
their START; splitting or padding the straddle is the trainer's concern
and keeps the assignment a pure per-row function of the prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def shard_pack(df: DataFrame, *, tokens_col: str, order_col: str,
               shard_tokens: int, bucket_size: int = 1 << 20) -> DataFrame:
    """Append ``global_start``, ``shard_id`` and ``shard_offset`` columns:
    the document's first-token position in corpus order, the shard whose
    ``shard_tokens`` budget contains that position, and the position
    within the shard.

    ``order_col`` must be a UNIQUE integer key whose ascending order
    defines the corpus order (dense ids not required — gaps only skip
    bucket rows; duplicates would make the running sum depend on the
    tie-break order, which differs between runs and engines — Spark's
    ROWS frame splits ties, SQL's default RANGE frame lumps them).
    ``bucket_size`` trades bucket-frame size against per-bucket
    parallelism; the default 2^20 keeps the bucket-totals frame ~10^6
    rows per 10^12 documents.
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    ok = F.col(order_col).cast("long")
    # integer-exact bucket label (floor(ok / B) via double loses exactness
    # past 2^53; subtracting the remainder stays exact for any long key
    # and preserves bucket order, which steps 2-3 rely on)
    d = df.withColumn("_bkt", ok - F.pmod(ok, F.lit(bucket_size)))

    w_local = (Window.partitionBy("_bkt").orderBy(ok)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_cum_incl",
                     F.sum(F.col(tokens_col).cast("long")).over(w_local))

    totals = d.groupBy("_bkt").agg(F.max("_cum_incl").alias("_tot"))
    w_bkts = (Window.orderBy("_bkt")
              .rowsBetween(Window.unboundedPreceding, -1))
    prefixes = totals.select(
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_bkts), F.lit(0)).alias("_pre"))

    start = (F.col("_pre") + F.col("_cum_incl")
             - F.col(tokens_col).cast("long"))
    return (d.join(F.broadcast(prefixes), "_bkt")
            .withColumn("global_start", start)
            # integer `div`, not floor(x / S): double division loses
            # exactness once the corpus token count passes 2^53
            .withColumn("shard_id",
                        F.expr(f"global_start div {int(shard_tokens)}"))
            .withColumn("shard_offset",
                        F.col("global_start") % shard_tokens)
            .drop("_bkt", "_cum_incl", "_pre"))
