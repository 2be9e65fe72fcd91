#!/usr/bin/env python3
"""Corpus deduplication job: near-dup pairs -> clusters -> deduped corpus.

Run via spark-submit (or plain python, from any cwd):

    spark-submit --py-files geomesa_spark.zip jobs/dedup_corpus.py \
        --table /data/documents.parquet --out /data/dedup \
        --method minhash --threshold 0.5

The operational wrapper over the dedup operator family
(``geomesa_spark.text.dedup`` + ``operators/graph.py``) — the same
pattern the reference ships as command-line data-management tools next
to its library API (geomesa-tools' ingest/export commands over the
DataStore API). Methods:

- ``minhash``  — MinHash+LSH banded candidates, exact-verified Jaccard
                 (the corpus-scale default),
- ``simhash``  — 64-bit SimHash, hamming <= --max-hamming (exact via
                 pigeonhole banding),
- ``ngram``    — EXACT all-pairs shingle Jaccard (audit tool; cost grows
                 with sum df^2 — use --audit-cap on large corpora),
- ``exact``    — normalized-text exact dedup (no pair stage).

Resumability (north rule): every stage materializes to its own parquet
directory under --out (``pairs/``, ``clusters/``, ``corpus/``) and a
re-run SKIPS any stage whose ``_SUCCESS`` marker exists, reading the
stored result instead — a killed job continues from its last completed
stage, and downstream stages of a tuned upstream can be recomputed by
deleting just their directories. ``--force`` recomputes everything.
Prints one JSON line with per-stage rows / walls / resumed flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage(spark, path: str, compute, *, force: bool = False,
           metrics: dict | None = None, name: str | None = None):
    """Materialize ``compute()`` to ``path`` unless its _SUCCESS marker
    already exists (resume), then return the stored frame — downstream
    stages always read the parquet, so a resumed run and a fresh run see
    byte-identical inputs."""
    done = os.path.exists(os.path.join(path, "_SUCCESS"))
    t0 = time.perf_counter()
    if force or not done:
        compute().write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    if metrics is not None and name is not None:
        metrics[name] = {"rows": out.count(),
                         "wall_s": round(time.perf_counter() - t0, 3),
                         "resumed": bool(done and not force)}
    return out


def run_dedup(spark, table: str, out_dir: str, *, method: str = "minhash",
              threshold: float = 0.5, max_hamming: int = 3,
              ngram_n: int = 3, audit_cap: int | None = None,
              id_col: str = "doc_id", text_col: str = "text",
              force: bool = False) -> dict:
    """Run the dedup pipeline; returns the metrics dict (also what the
    CLI prints). Importable so tests drive it on the shared session."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.graph import connected_components
    from geomesa_spark.text import dedup as D

    metrics: dict = {"method": method, "table": table, "out": out_dir}
    df = spark.read.parquet(table)
    metrics["docs_in"] = df.count()

    if method == "exact":
        keepers = _stage(
            spark, os.path.join(out_dir, "clusters"),
            lambda: D.exact_dedup(df, id_col=id_col, text=text_col),
            force=force, metrics=metrics, name="clusters")
        corpus = _stage(
            spark, os.path.join(out_dir, "corpus"),
            lambda: df.join(keepers.select(id_col), id_col, "left_semi"),
            force=force, metrics=metrics, name="corpus")
        metrics["docs_out"] = metrics["corpus"]["rows"]
        metrics["removed"] = metrics["docs_in"] - metrics["docs_out"]
        return metrics

    if method == "minhash":
        def pair_fn():
            return D.minhash_pairs(df, threshold=threshold,
                                   id_col=id_col, text=text_col) \
                .select("a", "b")
    elif method == "simhash":
        def pair_fn():
            return D.simhash_pairs(df, max_hamming=max_hamming,
                                   id_col=id_col, text=text_col) \
                .select("a", "b")
    elif method == "ngram":
        def pair_fn():
            return D.ngram_jaccard_pairs(df, n=ngram_n,
                                         threshold=threshold,
                                         id_col=id_col, text=text_col,
                                         audit_cap=audit_cap) \
                .select("a", "b")
    else:
        raise ValueError(f"unknown method {method!r}")

    pairs = _stage(spark, os.path.join(out_dir, "pairs"), pair_fn,
                   force=force, metrics=metrics, name="pairs")
    clusters = _stage(
        spark, os.path.join(out_dir, "clusters"),
        lambda: connected_components(pairs),
        force=force, metrics=metrics, name="clusters")
    # victims = every cluster member except its canonical keeper
    # (comp = min member id); docs in no cluster keep themselves
    victims = clusters.where(F.col("node") != F.col("comp")) \
        .select(F.col("node").alias(id_col))
    corpus = _stage(
        spark, os.path.join(out_dir, "corpus"),
        lambda: df.join(victims, id_col, "left_anti"),
        force=force, metrics=metrics, name="corpus")
    metrics["docs_out"] = metrics["corpus"]["rows"]
    metrics["removed"] = metrics["docs_in"] - metrics["docs_out"]
    metrics["n_clusters"] = clusters.select("comp").distinct().count()
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="parquet with (doc_id, text, ...) rows")
    ap.add_argument("--out", required=True,
                    help="output root: pairs/ clusters/ corpus/")
    ap.add_argument("--method", default="minhash",
                    choices=("minhash", "simhash", "ngram", "exact"))
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="Jaccard threshold (minhash/ngram)")
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash hamming radius (<= 3)")
    ap.add_argument("--ngram-n", type=int, default=3)
    ap.add_argument("--audit-cap", type=int,
                    help="ngram only: restrict to doc_id < cap "
                         "(audit-sample mode; see ngram_jaccard_pairs)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--force", action="store_true",
                    help="recompute every stage even if _SUCCESS exists")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("dedup-corpus")
             .config("spark.sql.shuffle.partitions", str(max(8, args.cpus)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_spark.shipping import ship_package
    ship_package(spark)  # workers need the package from any cwd

    t0 = time.perf_counter()
    metrics = run_dedup(spark, args.table, args.out, method=args.method,
                        threshold=args.threshold,
                        max_hamming=args.max_hamming,
                        ngram_n=args.ngram_n, audit_cap=args.audit_cap,
                        id_col=args.id_col, text_col=args.text_col,
                        force=args.force)
    metrics["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
