#!/usr/bin/env python3
"""Checkpointed, resumable image-table ingest job.

Run via spark-submit (per BASELINE.json north_rule):

    spark-submit --py-files geomesa_spark.zip jobs/ingest_images.py \
        --path /data/images_table --n 100000 --chunk-rows 10000

Re-running after a kill resumes at the first uncommitted chunk (lineage
rows are the commit markers). Per-partition lineage + metrics land in
``<path>/_lineage``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--chunk-rows", type=int, default=10_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geomesa_spark.sources.table import ingest_images, lineage_df

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("ingest-images")
             .config("spark.sql.shuffle.partitions", str(max(8, args.cpus)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_spark.shipping import ship_package
    ship_package(spark)  # workers need the package from any cwd

    summary = ingest_images(spark, args.path, n=args.n,
                            chunk_rows=args.chunk_rows)
    lin = lineage_df(spark, args.path)
    summary["total_rows"] = lin.agg({"n_rows": "sum"}).collect()[0][0]
    summary["n_partitions"] = lin.select("cell_prefix").distinct().count()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
