#!/usr/bin/env python3
"""Checkpointed streaming density job (geomesa-kafka DensityScan analog).

Run via spark-submit (or plain python, from any cwd):

    spark-submit --py-files geomesa_spark.zip jobs/stream_density.py \
        --input /data/event_stream --out /data/density \
        --checkpoint /data/density_ckpt --envelope -180,-90,180,90 \
        --width 360 --height 180

Reads a file-source stream (the sandbox stand-in for the reference's
Kafka consumer — same Structured Streaming operators, documented in
SURVEY.md §8), aggregates watermarked event-time density windows
(``geomesa_spark.streaming.density.streaming_density``) and appends
closed windows to a parquet sink.

Resumability (north rule): the ``--checkpoint`` directory carries the
source offsets AND the window/watermark state, so a killed job — or the
default ``--once`` batch-style trigger re-run on a growing input
directory — continues exactly where it left off: already-processed
files are not re-read, and a window is emitted exactly once, when a
later run's data advances the watermark past its end. Delete the
checkpoint to reprocess from scratch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCHEMA = "key string, ts timestamp, lon double, lat double"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="stream source directory (new files = new data)")
    ap.add_argument("--out", required=True, help="parquet sink directory")
    ap.add_argument("--checkpoint", required=True,
                    help="offsets + window state; reuse to resume")
    ap.add_argument("--source", choices=("json", "parquet"), default="json")
    ap.add_argument("--schema", default=DEFAULT_SCHEMA)
    ap.add_argument("--envelope", default="-180,-90,180,90",
                    help="xmin,ymin,xmax,ymax")
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--window", default="10 minutes")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--continuous", action="store_true",
                    help="keep running on a processing-time trigger "
                         "instead of the default availableNow batch")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geomesa_spark.streaming.density import streaming_density

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("stream-density")
             .config("spark.sql.shuffle.partitions", str(max(8, args.cpus)))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_spark.shipping import ship_package
    ship_package(spark)  # workers need the package from any cwd

    reader = spark.readStream.schema(args.schema)
    src = (reader.parquet(args.input) if args.source == "parquet"
           else reader.json(args.input))
    env = tuple(float(v) for v in args.envelope.split(","))
    dens = streaming_density(src, envelope=env, width=args.width,
                             height=args.height, window=args.window,
                             watermark=args.watermark)
    writer = (dens.writeStream.format("parquet")
              .option("path", args.out)
              .option("checkpointLocation", args.checkpoint)
              .outputMode("append"))
    if args.continuous:
        q = writer.trigger(processingTime="10 seconds").start()
        q.awaitTermination()  # until killed; checkpoint resumes it
        return
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    sink = spark.read.schema(
        "window_start timestamp, col int, row int, weight long"
    ).parquet(args.out)
    n_windows = sink.select("window_start").distinct().count()
    print(json.dumps({"sink_rows": sink.count(),
                      "closed_windows": n_windows,
                      "checkpoint": args.checkpoint}))
    spark.stop()


if __name__ == "__main__":
    main()
