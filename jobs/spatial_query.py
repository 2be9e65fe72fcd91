#!/usr/bin/env python3
"""Spatial/temporal/attribute query job over an ingested cell-partitioned
table, planned by the mixed-filter planner + cost-based strategy decider.

Run via spark-submit (per BASELINE.json north_rule):

    spark-submit --py-files geomesa_spark.zip jobs/spatial_query.py \
        --table /data/images_table --bbox=-30,-20,40,35 \
        [--t0 2024-01-08T00:00:00 --t1 2024-01-15T00:00:00] \
        [--attr fmt=raw] [--loose-bbox] [--out /data/query_out]

Prints one JSON line with the chosen strategy, row count, and wall time;
``--out`` additionally writes the matching rows as parquet.
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
    ap.add_argument("--table", required=True)
    ap.add_argument("--bbox", help="x0,y0,x1,y1")
    ap.add_argument("--t0")
    ap.add_argument("--t1")
    ap.add_argument("--attr", action="append", default=[],
                    help="column=value equality predicate (repeatable)")
    ap.add_argument("--ids", help="comma-separated feature ids (id "
                    "strategy: key-ordered lookup when --id-index given)")
    ap.add_argument("--id-col", default="image_id")
    ap.add_argument("--id-index",
                    help="path of a build_id_index table for --ids")
    ap.add_argument("--loose-bbox", action="store_true")
    ap.add_argument("--allow-full-scan", action="store_true")
    ap.add_argument("--out")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geomesa_spark.plans.filters import (And, Attr, Time, and_, bbox,
                                             plan_query)
    from geomesa_spark.plans.strategy import decide, read_stats

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("geomesa-spark-query")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_spark.shipping import ship_package
    ship_package(spark)  # workers need the package from any cwd

    parts = []
    if args.bbox:
        x0, y0, x1, y1 = (float(v) for v in args.bbox.split(","))
        parts.append(bbox(x0, y0, x1, y1))
    if args.t0 or args.t1:
        parts.append(Time(args.t0, args.t1))
    for a in args.attr:
        col, val = a.split("=", 1)
        parts.append(Attr(col, "=", val))
    if args.ids:
        # coerce the IN literals to the id COLUMN's type (read from the
        # table schema, not guessed from the literal shape): wrong-typed
        # literals make Spark cast the COLUMN — an ANSI runtime error on
        # non-numeric ids like 'img-000000002532', silent non-matches
        # otherwise — and defeat the sargable row-group pruning the id
        # index exists for
        from pyspark.sql.types import NumericType
        toks = [t.strip() for t in args.ids.split(",")]
        id_type = spark.read.parquet(args.table) \
            .schema[args.id_col].dataType
        vals = ([int(t) for t in toks]
                if isinstance(id_type, NumericType) else toks)
        parts.append(Attr(args.id_col, "in", vals))
    if not parts:
        raise SystemExit("no predicates; pass --bbox/--t0/--attr/--ids")
    f = parts[0] if len(parts) == 1 else and_(*parts)

    stats = read_stats(args.table)
    strategy = None
    if stats or args.ids:
        strategy = decide(f, stats or {"rows": 1},
                          allow_full_scan=args.allow_full_scan,
                          id_col=args.id_col if args.ids else None)

    df = spark.read.parquet(args.table)
    week_col = "epoch_week" if "epoch_week" in df.columns else None
    t0 = time.perf_counter()
    if strategy is not None and strategy.kind == "id":
        from geomesa_spark.plans.strategy import plan_with_strategy
        out = plan_with_strategy(
            spark, df, f, stats=stats or {"rows": 1},
            id_col=args.id_col, id_index=args.id_index,
            allow_full_scan=args.allow_full_scan)
    else:
        out = plan_query(df, f, week_col=week_col,
                         allow_full_scan=args.allow_full_scan,
                         loose_bbox=args.loose_bbox)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = out.count()
    wall = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "rows": n, "seconds": wall,
        "strategy": (strategy.kind if strategy else "planner-default"),
        "strategy_attribute": strategy.attribute if strategy else None,
        "estimated_cost": round(strategy.cost, 1) if strategy else None,
        "loose_bbox": args.loose_bbox,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
