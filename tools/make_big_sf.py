#!/usr/bin/env python3
"""Synthesize a larger benchmark scale factor from the driver-generated
sf0.1 fixtures (VERDICT r03 #7: per-query walls at sf0.1 are dominated by
per-job constants and ±35% host noise; a ≥5x fixture separates data-bound
walls from overhead-bound ones).

events replicate K times with id offsets (ids feed the derived lon/lat,
so each replica is new spatial data); documents get a deterministic
per-replica word permutation and embeddings a per-replica orthogonal
coordinate roll, so text/vector replicas are genuinely new corpora (not
K-way exact duplicates that would inflate the dedup/ANN queries ~K^2);
the TPC-H relational tables are copied unscaled —
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

# Verbatim replicas would make every document / embedding an exact K-way
# duplicate: the dedup queries would measure duplication pathology
# (~K^2 pair inflation), not K-times-the-data scaling. Replica k > 0
# therefore gets genuinely-new payloads that preserve the marginal
# statistics:
# - documents: a deterministic per-(doc, k) word permutation — token
#   multiset, length, and language markers unchanged; 3-gram shingle
#   sets destroyed, so no cross-replica near-dups.
# - embeddings: a cyclic coordinate roll of (k*17) % dim — an orthogonal
#   transform, so every WITHIN-replica cosine (and each replica's
#   planted near-dup structure) is preserved exactly while cross-replica
#   cosines are random-level.


def perm_text(big):
    """Deterministic per-(doc_id, __k__) word permutation of `text`.

    Latent edge (absent from the current fixture, verified): a doc whose
    token multiset admits only one ordering (single-token or
    all-identical tokens) permutes to itself, so its replicas WOULD be
    exact duplicates — re-check if the source fixture is regenerated."""
    from pyspark.sql import functions as F
    shuffled = F.array_join(
        F.transform(
            F.array_sort(F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.struct(
                    F.xxhash64(t, F.col("doc_id"), F.col("__k__"))
                    .alias("h"), t.alias("t")))),
            lambda s: s["t"]), " ")
    return big.withColumn(
        "text", F.when(F.col("__k__") == 0,
                       F.col("text")).otherwise(shuffled))


def roll_embedding(big):
    """Cyclic coordinate roll of `embedding`, shift never 0 for k > 0
    (a zero shift — e.g. dim 17 or factor >= 65 at dim 64 — would yield
    the verbatim duplicate replicas this transform exists to prevent)."""
    from pyspark.sql import functions as F
    dim = F.size("embedding")
    shift = (F.col("__k__") * 17 - 1) % (dim - 1) + 1
    rolled = F.concat(F.slice("embedding", shift + 1, dim - shift),
                      F.slice("embedding", F.lit(1), shift))
    return big.withColumn(
        "embedding", F.when((F.col("__k__") == 0) | (dim <= 1),
                            F.col("embedding")).otherwise(rolled))


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

    def replicate(table: str, id_cols: list[str],
                  transform=None) -> None:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        base = df.count()
        ks = spark.range(args.factor).withColumnRenamed("id", "__k__")
        big = df.crossJoin(F.broadcast(ks))
        for c in id_cols:
            big = big.withColumn(
                c, F.col(c) + F.col("__k__") * F.lit(int(base)))
        if transform is not None:
            big = transform(big)
        big.drop("__k__").write.mode("overwrite") \
            .parquet(f"{out}/{table}.parquet")
        print(f"{table}: {base} -> {base * args.factor}")

    replicate("events", ["event_id"])
    replicate("documents", ["doc_id"], transform=perm_text)
    replicate("embeddings", ["vec_id"], transform=roll_embedding)
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
