"""XZ3 property tests (pattern of the reference's XZ3SFCTest, mirroring
test_xz2.py): index determinism, cover soundness — for random boxes B
with time intervals T, any (B, T) intersecting the query must fall inside
some cover range — and the end-to-end xz3_query vs a brute-force
bbox+interval oracle, including week-spanning intervals (write-side epoch
duplication) and the reserved epoch -1 catch-all."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.cells.xz3 import (XZ3_MAX_RES, xz3_code, xz3_covers,
                                     xz3_index)
from geomesa_spark.cells.z3 import WEEK_SECONDS


def _rand_elems(n, rng, max_w=5.0, max_h=2.0, max_d=6 * 3600.0):
    cx = rng.uniform(-175, 175, n)
    cy = rng.uniform(-85, 85, n)
    w = rng.uniform(0.01, max_w, n)
    h = rng.uniform(0.01, max_h, n)
    t0 = rng.uniform(0, WEEK_SECONDS * 0.9, n)
    d = rng.uniform(60, max_d, n)
    t1 = np.minimum(t0 + d, WEEK_SECONDS)
    return cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, t0, t1


def test_code_deterministic_and_bounded():
    rng = np.random.default_rng(61)
    x0, y0, x1, y1, t0, t1 = _rand_elems(2000, rng)
    a = xz3_code(x0, y0, x1, y1, t0, t1)
    b = xz3_code(x0, y0, x1, y1, t0, t1)
    assert np.array_equal(a, b)
    assert (a >= 0).all()
    assert (a <= (8 ** (XZ3_MAX_RES + 1) - 8) // 7).all()


def test_small_elements_get_deeper_codes():
    big = xz3_code([-40.0], [-40.0], [40.0], [40.0], [0.0],
                   [WEEK_SECONDS / 2])[0]
    small = xz3_code([10.0], [10.0], [10.001], [10.001], [1000.0],
                     [1060.0])[0]
    assert small > 0
    assert big < small


def test_index_epoch_binning():
    # interval starting in week 2900 -> epoch 2900; offsets in seconds
    base_us = 2900 * WEEK_SECONDS * 1_000_000
    epoch, code = xz3_index([0.0], [0.0], [1.0], [1.0],
                            [base_us + 3600_000_000],
                            [base_us + 7200_000_000])
    assert epoch[0] == 2900
    assert code[0] > 0


def test_cover_soundness():
    """Intersecting (box, interval) elements are always covered."""
    rng = np.random.default_rng(62)
    x0, y0, x1, y1, t0, t1 = _rand_elems(3000, rng)
    codes = xz3_code(x0, y0, x1, y1, t0, t1)
    day = 24 * 3600.0
    for (qx0, qy0, qx1, qy1, qt0, qt1) in [
            (-20, -10, 30, 25, 0.0, day),
            (100, 40, 140, 60, 2 * day, 3 * day),
            (-179, -89, -150, -70, 0.0, WEEK_SECONDS),
            (-5, -5, 5, 5, 6 * day, WEEK_SECONDS)]:
        ranges = xz3_covers(qx0, qy0, qx1, qy1, qt0, qt1)
        inter = ~((x1 < qx0) | (x0 > qx1) | (y1 < qy0) | (y0 > qy1)
                  | (t1 < qt0) | (t0 > qt1))
        in_cover = np.zeros(len(codes), dtype=bool)
        for lo, hi in ranges:
            in_cover |= (codes >= lo) & (codes <= hi)
        missed = inter & ~in_cover
        assert not missed.any(), \
            f"query {(qx0, qy0, qx1, qy1, qt0, qt1)} missed {missed.sum()}"


def test_cover_selectivity():
    rng = np.random.default_rng(63)
    x0, y0, x1, y1, t0, t1 = _rand_elems(5000, rng, max_w=1.0, max_h=1.0,
                                         max_d=3600.0)
    codes = xz3_code(x0, y0, x1, y1, t0, t1)
    ranges = xz3_covers(-5, -5, 5, 5, 0.0, 24 * 3600.0)
    in_cover = np.zeros(len(codes), dtype=bool)
    for lo, hi in ranges:
        in_cover |= (codes >= lo) & (codes <= hi)
    assert in_cover.mean() < 0.5


class TestXZ3Query:
    """End-to-end spatio-temporal range query vs brute force."""

    def _frame(self, spark, rng, n=1500, long_lived=10):
        base = 2900 * WEEK_SECONDS  # some week in 2025
        x0, y0, x1, y1, t0, t1 = _rand_elems(n, rng)
        # scatter starts across 3 weeks; some intervals cross week bounds
        week = rng.integers(0, 3, n)
        abs0 = base + week * WEEK_SECONDS + t0
        abs1 = abs0 + (t1 - t0) + rng.choice(
            [0.0, WEEK_SECONDS * 1.5], n, p=[0.9, 0.1])
        # a few ultra-long intervals exercise the reserved epoch -1
        abs1[:long_lived] = abs0[:long_lived] + WEEK_SECONDS * 40
        rows = [(int(i), float(a), float(b), float(c), float(d),
                 float(e), float(f))
                for i, (a, b, c, d, e, f) in enumerate(
                    zip(x0, y0, x1, y1, abs0, abs1))]
        df = spark.createDataFrame(
            rows, "id long, xmin double, ymin double, xmax double, "
                  "ymax double, sec0 double, sec1 double") \
            .withColumn("t0", F.timestamp_seconds("sec0")) \
            .withColumn("t1", F.timestamp_seconds("sec1"))
        return df, rows

    def test_query_matches_bruteforce(self, spark):
        from geomesa_spark.operators.xz3_query import with_xz3, xz3_query
        rng = np.random.default_rng(64)
        df, rows = self._frame(spark, rng)
        indexed = with_xz3(df).cache()
        base = 2900 * WEEK_SECONDS
        day = 24 * 3600.0
        for (bbox, qt0, qt1) in [
                ((-20.0, -10.0, 30.0, 25.0), base, base + day),
                ((100.0, 40.0, 140.0, 60.0),
                 base + WEEK_SECONDS + 2 * day, base + WEEK_SECONDS + 3 * day),
                ((-1.0, -1.0, 1.0, 1.0), base, base + 3 * WEEK_SECONDS)]:
            got = {r["id"] for r in
                   xz3_query(indexed, bbox, qt0, qt1).collect()}
            qx0, qy0, qx1, qy1 = bbox
            want = {i for (i, x0, y0, x1, y1, s0, s1) in rows
                    if x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
                    and s0 <= qt1 and s1 >= qt0}
            assert got == want, (bbox, qt0, qt1)

    def test_no_duplicate_rows(self, spark):
        from geomesa_spark.operators.xz3_query import with_xz3, xz3_query
        rng = np.random.default_rng(65)
        df, _ = self._frame(spark, rng, n=400)
        indexed = with_xz3(df)
        base = 2900 * WEEK_SECONDS
        out = xz3_query(indexed, (-180.0, -90.0, 180.0, 90.0),
                        base, base + 3 * WEEK_SECONDS)
        ids = [r["id"] for r in out.collect()]
        assert len(ids) == len(set(ids))

    def test_long_interval_collapses_interior_epochs(self, spark):
        """A multi-week query's fully-covered interior weeks share ONE
        cover term under an epoch BETWEEN (ninth round-5 review batch):
        the predicate must stay O(boundary + 1 shared term), not
        O(weeks x max_terms), and still select exactly the brute-force
        rows."""
        from geomesa_spark.operators.xz3_query import (with_xz3, xz3_query,
                                                       xz3_range_predicate)
        rng = np.random.default_rng(67)
        df, rows = self._frame(spark, rng, n=600)
        indexed = with_xz3(df).cache()
        base = 2900 * WEEK_SECONDS
        # 20-week interval starting mid-week: 1 boundary + 19-ish interior
        qt0, qt1 = base + 3 * 24 * 3600.0, base + 20 * WEEK_SECONDS
        bbox = (-30.0, -20.0, 40.0, 35.0)
        got = {r["id"] for r in xz3_query(indexed, bbox, qt0, qt1).collect()}
        qx0, qy0, qx1, qy1 = bbox
        want = {i for (i, x0, y0, x1, y1, s0, s1) in rows
                if x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
                and s0 <= qt1 and s1 >= qt0}
        assert got == want
        # size: one shared interior term, not one per interior epoch —
        # the long predicate mentions far fewer epoch equality terms than
        # the 21 spanned weeks
        short = str(xz3_range_predicate(bbox, qt0, base + 2 * 24 * 3600.0)
                    ._jc)
        long_ = str(xz3_range_predicate(bbox, qt0, qt1)._jc)
        assert long_.count("epoch") <= short.count("epoch") + 4

    def test_predicate_is_sargable(self, spark):
        from geomesa_spark.operators.xz3_query import (with_xz3,
                                                       xz3_range_predicate)
        rng = np.random.default_rng(66)
        df, _ = self._frame(spark, rng, n=400)
        indexed = with_xz3(df)
        base = 2900 * WEEK_SECONDS
        pred = xz3_range_predicate((-5.0, -5.0, 5.0, 5.0),
                                   base, base + 24 * 3600.0)
        plan = indexed.where(pred)._jdf.queryExecution() \
            .optimizedPlan().toString()
        # the prune is pure column comparisons over epoch/xz3
        assert "epoch" in plan and "xz3" in plan


def test_index_subsecond_end_rounds_up():
    """xz3_index must round t1 UP to seconds: flooring shrinks the coded
    extent, and a shrunk element can land in a cell whose enlarged span
    ends before the true t1 — an under-selecting cover (eighth round-5
    review batch). The coded interval must contain the true one, so the
    code with a fractional-second end must equal the code of the
    whole-second-ceil interval, never the floor's."""
    base_us = 100 * WEEK_SECONDS * 1_000_000
    # true interval [3600, 3600.9] s within the week
    frac = xz3_index([0.0], [0.0], [0.5], [0.5],
                     [base_us + 3_600_000_000],
                     [base_us + 3_600_900_000])
    ceil = xz3_index([0.0], [0.0], [0.5], [0.5],
                     [base_us + 3_600_000_000],
                     [base_us + 3_601_000_000])
    assert frac[0][0] == ceil[0][0] == 100
    assert frac[1][0] == ceil[1][0]
    # and a whole-second end is itself unchanged by the ceil
    exact = xz3_index([0.0], [0.0], [0.5], [0.5],
                      [base_us + 3_600_000_000],
                      [base_us + 3_602_000_000])
    assert exact[1][0] == xz3_index(
        [0.0], [0.0], [0.5], [0.5],
        [base_us + 3_600_000_000], [base_us + 3_602_000_000])[1][0]
