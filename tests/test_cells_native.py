"""Parity: native Catalyst Z2 cell expression vs the numpy kernel
(the engine's two implementations of NormalizedDimension + Z2SFC semantics
must agree bit-for-bit, including the -1 reserved sentinel)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.cells import PARTITION_RES, cell_id, cell_prefix
from geomesa_spark.cells.native import cell_expr, cell_prefix_expr


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(99)
    lon = rng.uniform(-185, 185, 3000)  # includes out-of-range
    lat = rng.uniform(-95, 95, 3000)
    edge = [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (179.9999, 89.9999),
            (-180.0, 90.0), (180.0, -90.0), (float("nan"), 10.0),
            (10.0, float("nan")), (None, 5.0), (5.0, None)]
    rows = ([(float(a), float(b)) for a, b in zip(lon, lat)] + edge)
    df = spark.createDataFrame(rows, "lon double, lat double")
    return df, rows


@pytest.mark.parametrize("res", [1, 4, 8, 16, 31])
def test_native_matches_numpy(spark, points, res):
    df, rows = points
    got = [r["c"] for r in
           df.select(cell_expr("lon", "lat", res).alias("c")).collect()]
    lon = np.array([np.nan if r[0] is None else r[0] for r in rows])
    lat = np.array([np.nan if r[1] is None else r[1] for r in rows])
    want = cell_id(lon, lat, res)
    assert got == [int(v) for v in want]


def test_prefix_expr_matches_numpy(spark, points):
    df, rows = points
    got = [r["p"] for r in df.select(
        cell_prefix_expr(cell_expr("lon", "lat", 16), 16,
                         PARTITION_RES).alias("p")).collect()]
    lon = np.array([np.nan if r[0] is None else r[0] for r in rows])
    lat = np.array([np.nan if r[1] is None else r[1] for r in rows])
    want = cell_prefix(cell_id(lon, lat, 16), 16, PARTITION_RES)
    assert got == [int(v) for v in want]


def test_native_is_codegen(spark):
    """Plan-shape: the cell expression must not contain a Python UDF."""
    df = spark.range(10).select(
        (F.col("id") * 1.0 - 100).alias("lon"),
        (F.col("id") * 0.5 - 45).alias("lat"))
    out = df.select(cell_expr("lon", "lat", 8).alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
