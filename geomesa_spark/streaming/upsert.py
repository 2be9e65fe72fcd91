"""Upsert stream: GeoMesa's Kafka live feature cache as Structured
Streaming.

Reference semantics (cited for parity, no code copied):
- ``GeoMessage`` = put(feature) / delete(id) / clear, last-write-wins by
  feature id (/root/reference/geomesa-kafka/geomesa-kafka-datastore/src/
  main/scala/org/locationtech/geomesa/kafka/utils/GeoMessage.scala).
- Live cache = id -> latest feature map + spatial index, with TTL expiry
  (KafkaFeatureCacheImpl.scala:26-66; expiry params
  KafkaDataStoreParams.scala:149-195).
- The reference has no watermarks: arrival order wins and expiry is
  wall-clock eviction. For deterministic distributed semantics we adopt
  event-time: latest = max (ts, seq) per key; expiry = event-time TTL via
  state timeout (documented deviation, SURVEY.md §2.8).

Spark mapping: ``applyInPandasWithState`` keyed on the feature id —
per-key state holds the latest row; delete ops clear state; a state
timeout ``ttl`` past the watermark evicts. Emitted rows are state changes
(op = upsert | delete | expire), i.e. a changelog the sink can MERGE.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = ("ts long, lon double, lat double, payload string, "
                "seq long")
OUT_SCHEMA = ("key string, op string, ts timestamp, lon double, "
              "lat double, payload string")


def latest_by_key(df: DataFrame, key: str = "key", ts: str = "ts",
                  seq: str | None = None) -> DataFrame:
    """Batch compaction: last-write-wins snapshot of an upsert log
    (the lambda-store merged view / foreachBatch MERGE equivalent).

    GeoMessage semantics: rows whose latest op is a ``delete`` drop out;
    a ``clear`` op (key ignored) wipes everything written at or before
    its timestamp — handled here, where the whole log is visible, rather
    than in the per-key streaming state (documented split)."""
    clears = df.where(F.col("op") == "clear")
    data = df.where(F.col("op") != "clear")
    if not clears.isEmpty():
        cutoff = clears.agg(F.max(ts)).collect()[0][0]
        data = data.where(F.col(ts) > F.lit(cutoff))
    order = [F.desc(ts)] + ([F.desc(seq)] if seq else [])
    w = Window.partitionBy(key).orderBy(*order)
    latest = (data.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn"))
    return latest.where(F.col("op") != "delete")


def upsert_stream(events: DataFrame, *, ttl_seconds: int | None = None,
                  watermark_delay: str = "10 seconds") -> DataFrame:
    """Stateful last-write-wins upsert over a stream of
    (key, op, ts, lon, lat, payload[, seq]) events.

    Emits a changelog: one row per state change. With ``ttl_seconds``,
    keys idle past the watermark emit an ``expire`` row and drop state
    (the Kafka cache's eviction, deterministic via event time)."""
    ttl_ms = (ttl_seconds or 0) * 1000
    has_seq = "seq" in events.columns
    ev = events.withWatermark("ts", watermark_delay)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            ts_ms, lon, lat, payload, _ = state.get
            state.remove()
            yield pd.DataFrame([{
                "key": k, "op": "expire",
                "ts": pd.Timestamp(ts_ms, unit="ms"),
                "lon": lon, "lat": lat, "payload": payload}])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows["_ts_ms"] = (rows["ts"].astype("int64") // 1_000_000)
        if not has_seq:
            rows["seq"] = range(len(rows))
        # last-write-wins: max (ts, seq)
        rows = rows.sort_values(["_ts_ms", "seq"])
        last = rows.iloc[-1]
        cur = state.get if state.exists else None
        # without a real seq column the synthetic per-batch index is
        # incommensurable across micro-batches (batch 2's seq restarts
        # at 0): staleness is then decided on ts alone, same-ts arrivals
        # from a LATER batch win (arrival order = last write)
        cur_key = (cur[0], cur[4] if has_seq else -1) if cur else (-1, -1)
        if (int(last["_ts_ms"]), int(last["seq"])) < cur_key:
            return  # stale arrivals only; state unchanged
        if last["op"] == "delete":
            # tombstone if the key was live: in state, or put earlier in
            # this same batch (per-batch changelog compression)
            had = state.exists or bool((rows["op"] == "put").any())
            if state.exists:
                state.remove()
            if had:
                yield pd.DataFrame([{
                    "key": k, "op": "delete",
                    "ts": last["ts"], "lon": None, "lat": None,
                    "payload": None}])
            return
        state.update((int(last["_ts_ms"]),
                      None if pd.isna(last["lon"]) else float(last["lon"]),
                      None if pd.isna(last["lat"]) else float(last["lat"]),
                      None if last["payload"] is None else str(last["payload"]),
                      int(last["seq"])))
        if ttl_ms:
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(last["_ts_ms"]) + ttl_ms,
                                          wm + 1))
        yield pd.DataFrame([{
            "key": k, "op": "upsert", "ts": last["ts"],
            "lon": None if pd.isna(last["lon"]) else float(last["lon"]),
            "lat": None if pd.isna(last["lat"]) else float(last["lat"]),
            "payload": None if last["payload"] is None
            else str(last["payload"])}])

    timeout = (GroupStateTimeout.EventTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)
    return (ev.groupBy("key")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", timeout))


def replay_stream(spark, path: str, *, schema: str,
                  start_ts: str | None = None,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Replay/read-back of a persisted upsert log as a stream — the
    Kafka consumer's startingOffsets semantics (KafkaDataStoreParams.
    scala:100-108) over the file-source stand-in: ``start_ts`` replays
    from an event-time offset (earliest = None), and
    ``max_files_per_trigger`` paces the replay like a bounded consumer.
    Feed the result to ``upsert_stream`` to rebuild the live cache."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    out = r.parquet(path)
    if start_ts is not None:
        out = out.where(F.col("ts") >= F.lit(start_ts).cast("timestamp"))
    return out


def live_snapshot(changelog: DataFrame, *,
                  bbox: tuple[float, float, float, float] | None = None,
                  key: str = "key", ts: str = "ts") -> DataFrame:
    """Spatially-queryable LIVE view of the cache — the reference's
    in-cache grid index (BucketIndex, KafkaFeatureCacheImpl.scala:37-44)
    re-expressed over the materialized changelog: compaction keeps each
    key's latest state (upsert wins; delete/expire tombstones drop the
    key), a native cell column stands in for the grid buckets, and a
    bbox query prunes on the cell cover before the exact lon/lat refine.

    ``changelog``: the batch view of ``upsert_stream``'s sink (op in
    upsert|delete|expire). Cover may over-select, never under-select.
    """
    from geomesa_spark.cells import PARTITION_RES, bbox_cover
    from geomesa_spark.cells.native import cell_expr

    w = Window.partitionBy(key).orderBy(F.desc(ts))
    live = (changelog.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("op") == "upsert"))
            .drop("_rn")
            .withColumn("cell", cell_expr("lon", "lat", PARTITION_RES)))
    if bbox is None:
        return live
    x0, y0, x1, y1 = bbox
    cover = [int(c) for c in bbox_cover(x0, y0, x1, y1, PARTITION_RES)]
    return (live.where(F.col("cell").isin(cover))
            .where((F.col("lon") >= x0) & (F.col("lon") <= x1)
                   & (F.col("lat") >= y0) & (F.col("lat") <= y1)))
