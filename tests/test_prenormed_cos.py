"""cos_prenormed_expr (the one-fold cosine used by the stored-index ANN
paths) must agree with cos_expr's three-fold form whenever the query
side is unit-length — including the zero-norm row conventions."""

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.ml.similarity import (cos_expr, cos_prenormed_expr,
                                         norm_expr)


def test_prenormed_matches_full_cosine(spark):
    rng = np.random.default_rng(7)
    q = rng.standard_normal((6, 16))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c = rng.standard_normal((6, 16)) * 3.0
    c[4] = 0.0  # zero corpus vector -> cos 0 under both forms
    rows = [(qv.tolist(), cv.tolist()) for qv, cv in zip(q, c)]
    df = spark.createDataFrame(rows, "q array<double>, c array<double>")
    out = df.select(
        cos_expr("q", "c").alias("full"),
        cos_prenormed_expr("q", "c", norm_expr("c")).alias("pre")).collect()
    for r in out:
        assert abs(r.full - r.pre) < 1e-12


def test_prenormed_zero_norm_scores_zero(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 0.0])], "q array<double>, c array<double>")
    r = df.select(cos_prenormed_expr("q", "c",
                                     norm_expr("c")).alias("cos")).first()
    assert r.cos == 0.0
