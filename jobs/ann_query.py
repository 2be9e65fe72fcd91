#!/usr/bin/env python3
"""ANN top-k query job over an embeddings table, routed by the
cost-based ANN strategy decider (`geomesa_spark.ml.router` — the
StrategyDecider pattern applied to the exact/LSH/IVF family).

Run via spark-submit:

    spark-submit --py-files geomesa_spark.zip jobs/ann_query.py \
        --table /data/embeddings.parquet --k 10 \
        [--query-ids 0,50,100 | --query-every 50] \
        [--lsh-index /data/lsh_idx] [--ivf-index /data/ivf_idx] \
        [--build-indexes] [--force exact|lsh|ivf] [--out /data/topk]

With no stored index the router always picks exact brute force; pass
the index paths (or ``--build-indexes`` to create them next to the
table) to let the decider choose the pruned-scan paths when the corpus
size justifies them. Prints one JSON line with the chosen strategy,
its modeled cost/candidates, row count, and wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="parquet with (vec_id long, embedding array)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--query-ids", help="comma-separated vec_ids to query")
    ap.add_argument("--query-every", type=int, default=50,
                    help="use every Nth vector as a query (default 50)")
    ap.add_argument("--lsh-index", help="build_lsh_index output path")
    ap.add_argument("--ivf-index", help="build_ivf_index output path")
    ap.add_argument("--build-indexes", action="store_true",
                    help="build any missing index at <table>_{lsh,ivf}_idx")
    ap.add_argument("--multiprobe", type=int, default=1)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--force", choices=("exact", "lsh", "ivf"),
                    help="bypass the decider (debugging/benchmarks)")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--out")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from geomesa_spark.ml import router
    from geomesa_spark.ml.ivf import build_ivf_index, load_ivf_index
    from geomesa_spark.ml.similarity import (build_lsh_index,
                                             default_n_planes,
                                             load_lsh_index)

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("geomesa-spark-ann-query")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_spark.shipping import ship_package
    ship_package(spark)  # workers need the package from any cwd

    corpus = spark.read.parquet(args.table)
    n_rows = corpus.count()
    if args.query_ids:
        # type the literals from the table schema (the spatial_query.py
        # --ids fix): string id columns like 'img-000000002532' must not
        # crash in int() or silently never match
        from pyspark.sql.types import NumericType
        toks = [t.strip() for t in args.query_ids.split(",")]
        if isinstance(corpus.schema[args.id_col].dataType, NumericType):
            toks = [int(t) for t in toks]
        qpred = F.col(args.id_col).isin(toks)
    else:
        qpred = F.col(args.id_col) % args.query_every == 0
    queries = corpus.where(qpred).select(
        F.col(args.id_col).cast("string").alias("query_id"), args.vec_col)
    n_queries = queries.count()

    # default index locations (what --build-indexes creates): pick them
    # up automatically when present, so a prior --build-indexes run's
    # indexes aren't silently ignored on the next invocation
    base = args.table.rstrip("/")
    lsh_path, ivf_path = args.lsh_index, args.ivf_index
    if not lsh_path and os.path.exists(
            os.path.join(f"{base}_lsh_idx", "_SUCCESS")):
        lsh_path = f"{base}_lsh_idx"
    if not ivf_path and os.path.exists(
            os.path.join(f"{base}_ivf_idx", "_SUCCESS")):
        ivf_path = f"{base}_ivf_idx"
    if args.build_indexes:
        lsh_path = lsh_path or f"{base}_lsh_idx"
        ivf_path = ivf_path or f"{base}_ivf_idx"
        if not os.path.exists(os.path.join(lsh_path, "_SUCCESS")):
            build_lsh_index(corpus, lsh_path, id_col=args.id_col,
                            vec_col=args.vec_col,
                            n_planes=default_n_planes(n_rows))
        if not os.path.exists(os.path.join(ivf_path, "_SUCCESS")):
            build_ivf_index(corpus, ivf_path, id_col=args.id_col,
                            vec_col=args.vec_col)
    lsh = load_lsh_index(spark, lsh_path) if lsh_path else None
    ivf = load_ivf_index(spark, ivf_path) if ivf_path else None

    decision = router.decide_ann(
        n_rows, n_queries,
        lsh_meta=lsh[1] if lsh else None,
        ivf_meta=ivf[2] if ivf else None,
        multiprobe=args.multiprobe, nprobe=args.nprobe)
    if args.force:
        # a parquet dir whose sidecar is missing loads with meta=None —
        # treat it as no usable index rather than crashing in dispatch
        if args.force == "lsh" and (lsh is None or lsh[1] is None):
            ap.error("--force lsh needs a stored LSH index (with its "
                     "meta sidecar): pass --lsh-index or run with "
                     "--build-indexes first")
        if args.force == "ivf" and (ivf is None or ivf[2] is None):
            ap.error("--force ivf needs a stored IVF index (with its "
                     "meta sidecar): pass --ivf-index or run with "
                     "--build-indexes first")
        decision = router.AnnStrategy(args.force, float("nan"), -1,
                                      "forced by --force")
        orig, router.decide_ann = router.decide_ann, \
            lambda *a, **k: decision
    t0 = time.time()
    try:
        out = router.ann_topk_routed(
            corpus, queries, args.k, lsh=lsh, ivf=ivf,
            multiprobe=args.multiprobe, nprobe=args.nprobe,
            id_col=args.id_col, vec_col=args.vec_col,
            n_rows=n_rows, n_queries=n_queries)
        rows = out.count()
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
    finally:
        if args.force:
            router.decide_ann = orig
    print(json.dumps({
        "strategy": decision.kind, "reason": decision.reason,
        "modeled_cost_s": None if decision.cost != decision.cost
        else round(decision.cost, 3),
        "modeled_candidates": decision.candidates,
        "n_rows": n_rows, "n_queries": n_queries, "k": args.k,
        "rows": rows, "wall_s": round(time.time() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
