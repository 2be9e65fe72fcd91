"""kNN + density oracles: brute-force comparison on seeded synthetic points
(the reference's process-level golden-test pattern,
KNearestNeighborSearchProcessTest / DensityProcessTest)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geo.measures import haversine_m
from geomesa_spark.operators.density import density
from geomesa_spark.operators.knn import knn_join

RNG = np.random.default_rng(42)
N = 2000
LON = RNG.uniform(-180, 180, N)
LAT = RNG.uniform(-90, 90, N)

# hand-placed queries incl. edge cases (FIXTURES.md §3)
QUERIES = [
    ("q-uniform", 12.3, 45.6),
    ("q-origin", 0.0, 0.0),
    ("q-antimeridian-e", 179.9, 10.0),
    ("q-antimeridian-w", -179.9, 10.0),
    ("q-near-pole", 20.0, 89.5),
    ("q-south", -60.0, -80.0),
]
K = 10


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(int(i), float(LON[i]), float(LAT[i])) for i in range(N)],
        "point_id int, lon double, lat double")


def brute_knn(qlon, qlat, k):
    d = haversine_m(LON, LAT, np.full(N, qlon), np.full(N, qlat))
    idx = np.argsort(d, kind="stable")[:k]
    return [(int(i), float(d[i])) for i in idx]


def test_knn_matches_brute_force(points):
    out = knn_join(points, QUERIES, K)
    rows = out.select("query_id", "rank", "point_id", "dist_m").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.point_id, r.dist_m))
    assert set(by_q) == {q[0] for q in QUERIES}
    for qid, qlon, qlat in QUERIES:
        got = sorted(by_q[qid])
        expected = brute_knn(qlon, qlat, K)
        assert len(got) == K, qid
        got_ids = [pid for _, pid, _ in got]
        exp_ids = [pid for pid, _ in expected]
        # identical distance ordering (ids may differ only on exact ties)
        got_d = np.array([d for _, _, d in got])
        exp_d = np.array([d for _, d in expected])
        np.testing.assert_allclose(got_d, exp_d, rtol=1e-9)
        assert got_ids == exp_ids, qid


def test_knn_spheroid_matches_brute_force_vincenty(points):
    """metric="spheroid": exact under WGS84 Vincenty meters (the
    reference's ellipsoidal GeodeticCalculator,
    KNearestNeighborSearchProcess.scala:312-393); the inflated window
    keeps the candidate cover conservative."""
    from geomesa_spark.geo.measures import vincenty_m
    out = knn_join(points, QUERIES, K, metric="spheroid")
    rows = out.select("query_id", "rank", "point_id", "dist_m").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.point_id, r.dist_m))
    assert set(by_q) == {q[0] for q in QUERIES}
    for qid, qlon, qlat in QUERIES:
        d = vincenty_m(LON, LAT, np.full(N, qlon), np.full(N, qlat))
        idx = np.argsort(d, kind="stable")[:K]
        got = sorted(by_q[qid])
        np.testing.assert_allclose(
            np.array([x for _, _, x in got]), d[idx], rtol=1e-9)
        assert [pid for _, pid, _ in got] == [int(i) for i in idx], qid


def test_proximity_spheroid_matches_brute_force(points):
    from geomesa_spark.geo.measures import vincenty_m
    from geomesa_spark.operators.proximity import proximity_join
    radius = 900_000.0
    out = proximity_join(points, QUERIES, radius, metric="spheroid")
    got = {(r.query_id, r.point_id) for r in
           out.select("query_id", "point_id").collect()}
    want = set()
    for qid, qlon, qlat in QUERIES:
        d = vincenty_m(LON, LAT, np.full(N, qlon), np.full(N, qlat))
        want |= {(qid, int(i)) for i in np.nonzero(d <= radius)[0]}
    assert got == want and want


def test_knn_k_larger_than_matches(spark):
    few = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 10.1, 10.1), (3, 10.2, 10.2)],
        "point_id int, lon double, lat double")
    out = knn_join(few, [("q", 10.0, 10.05)], 10, max_rounds=40)
    assert out.count() == 3  # emits all available when < k exist


def test_density_grid(points):
    env = (-180.0, -90.0, 180.0, 90.0)
    out = density(points, envelope=env, width=36, height=18).collect()
    total = sum(r.weight for r in out)
    assert total == N  # every point lands in exactly one pixel
    # oracle: numpy 2d histogram with matching binning
    cols = np.minimum(np.floor((LON + 180) / 10).astype(int), 35)
    rows = np.minimum(np.floor((LAT + 90) / 10).astype(int), 17)
    from collections import Counter
    exp = Counter(zip(cols.tolist(), rows.tolist()))
    got = {(r.col, r.row): r.weight for r in out}
    assert got == dict(exp)
    # pixel centers
    r0 = [r for r in out if (r.col, r.row) == (0, 0)][0]
    assert (r0.x, r0.y) == (-175.0, -85.0)


def test_density_weighted(points):
    env = (-180.0, -90.0, 180.0, 90.0)
    out = density(points.withColumn("wt", F.col("point_id") % 3),
                  envelope=env, width=4, height=2, weight="wt").collect()
    total = sum(r.weight for r in out)
    assert total == sum(i % 3 for i in range(N))
