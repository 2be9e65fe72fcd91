#!/usr/bin/env python3
"""Hot-cell skew demonstration (VERDICT r02 #7).

Two fixtures at the same row count and byte size:
- uniform: the standard image fixture (phash-derived lon/lat, 10% city
  clusters),
- skewed: 80% of rows forced into ONE res-4 Z2 cell (the "dense urban
  cell" worst case for the default PARTITION_RES = 4 grain).

Both are written through the engine's cell-partitioned layout — the
skewed table twice: unsalted (one writer task owns 80% of the bytes) and
salted (write_images(salt=...), the ShardStrategy analog) — then the
flagship query pipeline (tile counts -> broadcast spatial join -> density
-> decode) runs on uniform vs skewed(salted) with AQE skew handling on.

Pass criterion (VERDICT): skewed within 1.3x of uniform end-to-end.
Why it holds by construction: tile/density aggregations partial-combine
map-side (a hot key arrives at the shuffle as one partial row per map
task), the join broadcasts the small side (skew-agnostic), and the scan
splits parquet files by maxPartitionBytes so the hot partition dir is
read by many tasks. The write side is where skew bites — measured here
as unsalted vs salted write walls.

Emits ONE JSON line and merges a "skew" section into BENCH_SCALING.json.

Usage: python bench_skew.py [--n-images 480000] [--salt 16] [--rounds 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import build_spark, run_job  # noqa: E402

# res-4 Z2 cell containing San Francisco: x bin 2, y bin 11
HOT_LON0, HOT_LON1 = -135.0, -112.5
HOT_LAT0, HOT_LAT1 = 33.75, 45.0
HOT_FRACTION = 0.8


def skewed_images(spark, n: int):
    """The uniform fixture with 80% of rows re-aimed (deterministically,
    by id hash) into the single hot cell."""
    from pyspark.sql import functions as F

    from geomesa_spark.raster.fixtures import images_df

    df = images_df(spark, n)
    u1 = F.pmod(F.xxhash64("image_id", F.lit(1)), 1_000_000) / 1_000_000.0
    u2 = F.pmod(F.xxhash64("image_id", F.lit(2)), 1_000_000) / 1_000_000.0
    hot = F.pmod(F.xxhash64("image_id", F.lit(3)), 10) \
        < int(HOT_FRACTION * 10)
    return (df.withColumn(
        "lon", F.when(hot, HOT_LON0 + u1 * (HOT_LON1 - HOT_LON0))
        .otherwise(F.col("lon")))
        .withColumn(
        "lat", F.when(hot, HOT_LAT0 + u2 * (HOT_LAT1 - HOT_LAT0))
        .otherwise(F.col("lat"))))


def timed_write(df, path: str, salt: int | None) -> float:
    from geomesa_spark.sources.table import write_images
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    write_images(df, path, salt=salt)
    return round(time.perf_counter() - t0, 3)


def cell_share(spark, path: str) -> float:
    """Fraction of rows in the hottest cell_prefix (the skew witness)."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(path)
    counts = df.groupBy("cell_prefix").count()
    mx, tot = counts.agg(F.max("count"), F.sum("count")).collect()[0]
    return round(mx / tot, 3)


def _uniform_points(spark, n: int):
    """Deterministic uniform world points (the events-points recipe,
    shared via __spark_entry__.lonlat_cols — one source of truth)."""
    from pyspark.sql import functions as F

    from __spark_entry__ import lonlat_cols
    return spark.range(n).select(F.col("id").alias("point_id"),
                                 *lonlat_cols("id"))


def _region_rows(hot: bool, n_regions: int):
    """WKB region boxes: ``hot`` stacks ALL regions over the one SF cell
    (the region-side hot spot); uniform spreads them 4-per-cell over 250
    res-4 cells. Box sizes are matched so total candidate pairs are
    ~equal — only the JOIN-KEY distribution differs."""
    import numpy as np

    from geomesa_spark.cells import cell_bounds
    from geomesa_spark.geo import Polygon, to_wkb

    rng = np.random.default_rng(5)
    rows = []
    for i in range(n_regions):
        if hot:
            x0c, y0c, x1c, y1c = HOT_LON0, HOT_LAT0, HOT_LON1, HOT_LAT1
        else:
            b = cell_bounds(np.array([i % 250]), 4)
            x0c, y0c, x1c, y1c = (float(v[0]) for v in b)
        w, h = x1c - x0c, y1c - y0c
        # sub-box covering ~81% of the cell area at a random offset:
        # overlapping hot boxes, non-identical (no WKB-memo shortcut)
        dx = float(rng.uniform(0, 0.1)) * w
        dy = float(rng.uniform(0, 0.1)) * h
        poly = Polygon([[x0c + dx, y0c + dy], [x0c + dx + 0.9 * w, y0c + dy],
                        [x0c + dx + 0.9 * w, y0c + dy + 0.9 * h],
                        [x0c + dx, y0c + dy + 0.9 * h], [x0c + dx, y0c + dy]])
        rows.append((f"r{i}", bytearray(to_wkb(poly))))
    return rows


def join_skew_bench(spark, n_points: int, n_regions: int, salt: int,
                    rounds: int) -> dict:
    """Region-side hot spot: n_regions overlapping boxes over ONE res-4
    cell vs the same boxes spread uniformly — equal candidate-pair work,
    all of it landing on one join key in the hot case. Three plans per
    fixture: broadcast (the engine default — region hot spots never
    concentrate by key because the big side is never shuffled on the
    cell), forced shuffle join with AQE skew-join splitting the hot
    partition, and forced shuffle + explicit salt (ShardStrategy)."""
    from geomesa_spark.operators.join import spatial_join

    pts = _uniform_points(spark, n_points).localCheckpoint()  # fix input
    # warm the Python UDF workers + JIT so the first timed plan doesn't
    # pay the per-core worker spawn (same discipline as bench.py)
    warm_regs = spark.createDataFrame(_region_rows(False, 8),
                                      "region_id string, geom binary")
    spatial_join(_uniform_points(spark, 10_000), warm_regs,
                 predicate="st_intersects", broadcast_regions=True).count()
    out: dict = {"n_points": n_points, "n_regions": n_regions}
    for name, hot in (("uniform", False), ("hot", True)):
        regs = spark.createDataFrame(_region_rows(hot, n_regions),
                                     "region_id string, geom binary")
        plans = {
            "broadcast": dict(broadcast_regions=True),
            "shuffle_aqe_skew": dict(broadcast_regions=False),
            "shuffle_salted": dict(broadcast_regions=False, salt=salt),
        }
        rec: dict = {}
        for pname, kw in plans.items():
            force = pname != "broadcast"
            if force:  # disable auto-broadcast so the shuffle path runs
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                best = None
                for _ in range(rounds):
                    t0 = time.perf_counter()
                    n = spatial_join(pts, regs,
                                     predicate="st_intersects", **kw) \
                        .count()
                    dt = round(time.perf_counter() - t0, 3)
                    best = dt if best is None else min(best, dt)
                rec[pname] = {"sec": best, "rows": n}
            finally:
                if force:
                    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        out[name] = rec
    for pname in ("broadcast", "shuffle_aqe_skew", "shuffle_salted"):
        out[f"ratio_{pname}"] = round(
            out["hot"][pname]["sec"] / out["uniform"][pname]["sec"], 3)
    out["pass_1p3x"] = out["ratio_broadcast"] <= 1.3
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=480_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--join-only", action="store_true",
                    help="run only the region-hot-spot join section")
    ap.add_argument("--join-points", type=int, default=2_000_000)
    ap.add_argument("--join-regions", type=int, default=1000)
    args = ap.parse_args()

    if args.join_only:
        spark = build_spark(args.cpus)
        spark.sparkContext.setLogLevel("ERROR")
        res = join_skew_bench(spark, args.join_points, args.join_regions,
                              args.salt, args.rounds)
        spark.stop()
        from bench_scaling import merge_bench_json
        merge_bench_json("BENCH_SCALING.json", {"join_skew": res})
        print(json.dumps(res))
        return

    base = f"/tmp/bench_skew_{args.n_images}"
    p_uni, p_skw = f"{base}/uniform", f"{base}/skewed"
    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # fixture cache: check each table independently (a run that died
    # after uniform/ but before skewed/ committed must rebuild skewed/,
    # not crash or time a half-written table); _SUCCESS = committed
    def _ok(p: str) -> bool:
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    t_w_uni = t_w_skw_unsalted = t_w_skw_salted = None
    if not _ok(p_uni):
        from geomesa_spark.raster.fixtures import images_df
        t_w_uni = timed_write(images_df(spark, args.n_images), p_uni, None)
    if not _ok(p_skw):
        skw = skewed_images(spark, args.n_images)
        t_w_skw_unsalted = timed_write(skw, f"{base}/skewed_unsalted", None)
        t_w_skw_salted = timed_write(skw, p_skw, args.salt)

    shares = {"uniform": cell_share(spark, p_uni),
              "skewed": cell_share(spark, p_skw)}

    # interleaved best-of rounds (same discipline as bench_scaling)
    best = {}
    for _ in range(args.rounds):
        for name, path in (("uniform", p_uni), ("skewed", p_skw)):
            r = run_job(spark, path, args.cpus)
            if name not in best or r["t_total"] < best[name]["t_total"]:
                best[name] = r
    spark.stop()

    ratio = round(best["skewed"]["t_total"] / best["uniform"]["t_total"], 3)
    result = {
        "metric": "hot-cell skew penalty (skewed/uniform wall ratio)",
        "value": ratio, "unit": "ratio", "n_images": args.n_images,
        "hot_cell_share": shares,
        "partition_res": 4, "salt": args.salt,
        "uniform": best["uniform"], "skewed": best["skewed"],
        "write_sec": {"uniform": t_w_uni,
                      "skewed_unsalted": t_w_skw_unsalted,
                      "skewed_salted": t_w_skw_salted},
        "pass_1p3x": ratio <= 1.3,
    }
    from bench_scaling import merge_bench_json
    merge_bench_json("BENCH_SCALING.json", {"skew": result})
    if not args.keep:
        shutil.rmtree(f"{base}/skewed_unsalted", ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
