#!/usr/bin/env python3
"""Synthesize a larger benchmark scale factor from the driver-generated
sf0.1 fixtures (VERDICT r03 #7: per-query walls at sf0.1 are dominated by
per-job constants and ±35% host noise; a ≥5x fixture separates data-bound
walls from overhead-bound ones).

events/documents/embeddings replicate K times with id offsets (ids feed
the derived lon/lat and the dedup/ANN fixtures, so each replica is new
data, not a duplicate); the TPC-H relational tables are copied unscaled —
they only back the two relational sanity queries, which are not the
headline. The image fixture scales automatically: the image count derives
from the events row count (``_n_images``).

Usage: python tools/make_big_sf.py [--factor 5] [--out /tmp/geomesa_bigsf]
Then:  SPARK_GRAFT_SF_DIR=<out>/sf0.5 python bench.py --rounds 2
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPY_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--out", default="/tmp/geomesa_bigsf")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()
    sf = 0.1 * args.factor
    out = os.path.join(args.out, f"sf{sf:g}")
    if os.path.exists(os.path.join(out, "_DONE")):
        print(f"already built: {out}")
        return

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("make-big-sf")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def replicate(table: str, id_cols: list[str]) -> None:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        base = df.count()
        ks = spark.range(args.factor).withColumnRenamed("id", "__k__")
        big = df.crossJoin(F.broadcast(ks))
        for c in id_cols:
            big = big.withColumn(
                c, F.col(c) + F.col("__k__") * F.lit(int(base)))
        big.drop("__k__").write.mode("overwrite") \
            .parquet(f"{out}/{table}.parquet")
        print(f"{table}: {base} -> {base * args.factor}")

    replicate("events", ["event_id"])
    replicate("documents", ["doc_id"])
    replicate("embeddings", ["vec_id"])
    for t in COPY_TABLES:
        src, dst = f"{SRC}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)
    spark.stop()
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"built: {out}")


if __name__ == "__main__":
    main()
