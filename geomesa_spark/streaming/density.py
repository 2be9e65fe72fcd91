"""Streaming spatial aggregations + the lambda merged view.

- ``streaming_density``: the DensityScan grid over a stream — event-time
  windows with a watermark for late data (documented deviation from the
  reference's arrival-order cache, SURVEY.md §2.8: we choose watermarked
  event time for determinism).
- ``lambda_view``: the geomesa-lambda pattern (/root/reference/
  geomesa-lambda/): recent features from the stream's upsert log merged
  over a persistent batch table — the stream's latest state wins per key,
  deletes suppress, untouched batch rows pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geomesa_spark.streaming.upsert import latest_by_key


def streaming_density(events: DataFrame, *,
                      envelope: tuple[float, float, float, float],
                      width: int, height: int,
                      window: str = "10 minutes",
                      watermark: str = "10 minutes",
                      ts: str = "ts", lon: str = "lon",
                      lat: str = "lat") -> DataFrame:
    """Per-window density grid over a stream: (window_start, col, row,
    weight). GridSnap floor-bin + clamp, map-side partial aggregation,
    watermark bounds state."""
    x0, y0, x1, y1 = (float(v) for v in envelope)
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    col = F.least(F.floor((F.col(lon) - F.lit(x0)) / F.lit(dx)),
                  F.lit(width - 1)).cast("int")
    row = F.least(F.floor((F.col(lat) - F.lit(y0)) / F.lit(dy)),
                  F.lit(height - 1)).cast("int")
    return (events.withWatermark(ts, watermark)
            .where((F.col(lon) >= x0) & (F.col(lon) <= x1)
                   & (F.col(lat) >= y0) & (F.col(lat) <= y1))
            .groupBy(F.window(ts, window).alias("w"),
                     col.alias("col"), row.alias("row"))
            .agg(F.count("*").alias("weight"))
            .select(F.col("w.start").alias("window_start"),
                    "col", "row", "weight"))


def lambda_view(batch: DataFrame, log: DataFrame, *, key: str = "key",
                ts: str = "ts", seq: str | None = "seq") -> DataFrame:
    """Merged batch+stream snapshot.

    ``batch``: persistent rows (one per key, no op column).
    ``log``: the upsert changelog (key, op, ts, ... [, seq]).
    Result: one row per live key — the log's latest state where present
    (deletes remove the key entirely), else the batch row.
    """
    if seq and seq not in log.columns:
        # the log carries no sequence column (it's optional); ordering
        # falls back to the timestamp alone — keeping the default 'seq'
        # would reference a column the combined frame doesn't have
        seq = None
    b = batch.withColumn("op", F.lit("put"))
    if seq and seq not in b.columns:
        # batch rows always lose ties against stream rows
        b = b.withColumn(seq, F.lit(-1).cast("long"))
    log_cols = set(log.columns)
    for c in log_cols - set(b.columns):
        b = b.withColumn(c, F.lit(None).cast(dict(log.dtypes)[c]))
    combined = b.select(*log.columns).unionByName(log)
    return latest_by_key(combined, key=key, ts=ts, seq=seq)
