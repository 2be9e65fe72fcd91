"""Spatial-join equivalence oracle: engine output must equal the brute-force
cartesian result — the reference's own oracle pattern
(SparkSQLDataTest.scala:298-352, seeded generators SparkSQLTestUtils.scala:
36-37,93-112)."""

import numpy as np
import pytest

from geomesa_spark.geo import Point, Polygon, to_wkb
from geomesa_spark.operators.join import (
    locate_points_in_geometry,
    spatial_join,
    spatial_join_pairs,
)

RNG = np.random.default_rng(0)
N_POINTS = 400
N_BOXES = 120


def make_points():
    lon = RNG.uniform(-180, 180, N_POINTS)
    lat = RNG.uniform(-90, 90, N_POINTS)
    return lon, lat


def make_boxes(n, rng):
    boxes = []
    for j in range(n):
        cx = rng.uniform(-180, 180)
        cy = rng.uniform(-90, 90)
        hw = 1.5 * rng.uniform()
        hh = 0.5 * rng.uniform()
        boxes.append((str(j + 1), cx - hw, cy - hh, cx + hw, cy + hh))
    return boxes


LON, LAT = make_points()
BOXES = make_boxes(N_BOXES, RNG)


def box_poly(x0, y0, x1, y1):
    return Polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])


def brute_force_pairs(predicate="st_contains"):
    out = set()
    for (bid, x0, y0, x1, y1) in BOXES:
        if predicate == "st_contains":
            hit = (LON > x0) & (LON < x1) & (LAT > y0) & (LAT < y1)
        else:  # intersects: boundary counts
            hit = (LON >= x0) & (LON <= x1) & (LAT >= y0) & (LAT <= y1)
        for i in np.nonzero(hit)[0]:
            out.add((int(i), bid))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(
        [(int(i), float(LON[i]), float(LAT[i])) for i in range(N_POINTS)],
        "point_id int, lon double, lat double")
    regs = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(x0, y0, x1, y1))))
         for (bid, x0, y0, x1, y1) in BOXES],
        "region_id string, geom binary")
    return pts, regs


def run_join(frames, predicate, **kw):
    pts, regs = frames
    out = spatial_join(pts, regs, predicate=predicate, **kw)
    return {(r.point_id, r.region_id) for r in out.select("point_id", "region_id").collect()}


def test_contains_matches_brute_force(frames):
    assert run_join(frames, "st_contains") == brute_force_pairs("st_contains")


def test_intersects_matches_brute_force(frames):
    assert run_join(frames, "st_intersects") == brute_force_pairs("st_intersects")


def test_broadcast_and_salted_paths_agree(frames):
    expected = brute_force_pairs("st_contains")
    assert run_join(frames, "st_contains", broadcast_regions=True) == expected
    assert run_join(frames, "st_contains", salt=4) == expected


def test_join_pairs_boxes_vs_boxes(spark):
    rng = np.random.default_rng(7)
    left = make_boxes(40, rng)
    right = make_boxes(40, rng)
    lf = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(*b)))) for (bid, *b) in left],
        "left_id string, geom binary")
    rf = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(*b)))) for (bid, *b) in right],
        "right_id string, geom_r binary")
    got = {(r.left_id, r.right_id)
           for r in spatial_join_pairs(lf, rf, predicate="st_intersects")
           .select("left_id", "right_id").collect()}
    expected = set()
    for (lid, lx0, ly0, lx1, ly1) in left:
        for (rid, rx0, ry0, rx1, ry1) in right:
            if lx0 <= rx1 and rx0 <= lx1 and ly0 <= ry1 and ry0 <= ly1:
                expected.add((lid, rid))
    assert got == expected


def test_join_pairs_non_intersects_predicates(spark):
    rng = np.random.default_rng(11)
    left = make_boxes(30, rng)
    right = make_boxes(30, rng) + left[:5]  # guarantee some equal pairs
    lf = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(*b)))) for (bid, *b) in left],
        "left_id string, geom binary")
    rf = spark.createDataFrame(
        [(f"r{k}", bytearray(to_wkb(box_poly(*b))))
         for k, (bid, *b) in enumerate(right)],
        "right_id string, geom_r binary")
    for pred, check in [
        # DE-9IM contains for non-degenerate boxes: B ⊆ A (boundary
        # contact allowed; contains(A, A) is true)
        ("st_contains", lambda l, r: l[0] <= r[0] and l[1] <= r[1]
         and l[2] >= r[2] and l[3] >= r[3]),
        ("st_equals", lambda l, r: l == r),
    ]:
        got = {(a.left_id, a.right_id)
               for a in spatial_join_pairs(lf, rf, predicate=pred)
               .select("left_id", "right_id").collect()}
        expected = {(lid, f"r{k}")
                    for (lid, *lb) in left
                    for k, (_, *rb) in enumerate(right)
                    if check(tuple(lb), tuple(rb))}
        assert got == expected, pred


def test_dense_cell_candidates_pruned(spark):
    """10k tiny boxes inside ONE partition cell: the JVM envelope
    pre-reject must cut the exact-refine workload to ~matches, not n²/2
    (sweepline-parity bound, GeoMesaJoinRelation.sweeplineJoin:41-55)."""
    from geomesa_spark.operators.join import _pair_candidates

    rng = np.random.default_rng(99)
    n = 10_000
    # all inside one res-4 cell (cell spans 22.5 x 11.25 deg at res 4)
    cx = rng.uniform(1.0, 9.0, n)
    cy = rng.uniform(1.0, 9.0, n)
    hw = rng.uniform(0.001, 0.01, n)
    boxes = [(f"b{i}", float(cx[i] - hw[i]), float(cy[i] - hw[i]),
              float(cx[i] + hw[i]), float(cy[i] + hw[i])) for i in range(n)]
    lf = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(*b)))) for (bid, *b) in boxes],
        "left_id string, geom binary")
    rf = spark.createDataFrame(
        [(bid, bytearray(to_wkb(box_poly(*b)))) for (bid, *b) in boxes],
        "right_id string, geom_r binary")
    cand = _pair_candidates(lf, rf, predicate="st_intersects",
                            left_geom="geom", right_geom="geom_r",
                            res=4).count()
    # brute-force expected matches (numpy, vectorized)
    x0, y0 = cx - hw, cy - hw
    x1, y1 = cx + hw, cy + hw
    matches = 0
    for i in range(n):
        hit = (x0 <= x1[i]) & (x0[i] <= x1) & (y0 <= y1[i]) & (y0[i] <= y1)
        matches += int(hit.sum())
    # every candidate is a true envelope overlap: count equals matches,
    # and both are ≪ n² (the un-pruned equi-join would emit n² pairs)
    assert cand == matches
    assert cand < n * n // 50
    got = spatial_join_pairs(lf, rf, predicate="st_intersects", res=4).count()
    assert got == matches  # boxes: envelope overlap == exact intersects


def test_locate_vectorized_matches_scalar():
    from geomesa_spark.geo import predicates as gp
    poly = Polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                   [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]])
    xs = np.array([5.0, 1.0, 0.0, -1.0, 3.0, 10.0, 5.0])
    ys = np.array([5.0, 1.0, 5.0, 5.0, 5.0, 10.0, 0.0])
    got = locate_points_in_geometry(xs, ys, poly)
    for i in range(len(xs)):
        loc = gp.locate(poly, float(xs[i]), float(ys[i]))
        want = {"I": 1, "B": 0, "E": -1}[loc]
        assert got[i] == want, (xs[i], ys[i], got[i], want)


class TestRefineScreenBlindSpots:
    """Adversarial pairs aimed at the vertex-location screens in
    udf_refine_pairs: cases the screens must leave to exact DE-9IM
    (edge-crossing-only intersections, all-vertices-inside
    non-containment) and cases they may decide (must agree with gp.*)."""

    def _pairs(self, spark, geoms_a, geoms_b, predicate):
        lf = spark.createDataFrame(
            [(f"a{i}", bytearray(to_wkb(g))) for i, g in enumerate(geoms_a)],
            "left_id string, geom binary")
        rf = spark.createDataFrame(
            [(f"b{i}", bytearray(to_wkb(g))) for i, g in enumerate(geoms_b)],
            "right_id string, geom_r binary")
        got = {(r["left_id"], r["right_id"]) for r in spatial_join_pairs(
            lf, rf, predicate=predicate, res=4).collect()}
        from geomesa_spark.geo import predicates as gp
        fn = {"st_intersects": gp.intersects, "st_contains": gp.contains,
              "st_within": gp.within, "st_touches": gp.touches}[predicate]
        want = {(f"a{i}", f"b{j}")
                for i, ga in enumerate(geoms_a)
                for j, gb in enumerate(geoms_b) if fn(ga, gb)}
        assert got == want

    def test_plus_sign_edge_crossing_only(self, spark):
        # two crossing rectangles: every vertex of each is EXTERIOR to
        # the other, intersection is edge-crossing only -> the vertex
        # screen cannot accept; exact must still return True
        horiz = box_poly(0.0, 4.0, 10.0, 6.0)
        vert = box_poly(4.0, 0.0, 6.0, 10.0)
        far = box_poly(20.0, 20.0, 21.0, 21.0)
        self._pairs(spark, [horiz, far], [vert, far], "st_intersects")

    def test_concave_all_vertices_inside_not_contained(self, spark):
        # U-shaped container: the triangle's vertices all sit inside the
        # U's arms, but its base edge spans the notch (outside) -> the
        # exterior-vertex reject cannot fire; exact must return False
        u = Polygon([[0, 0], [10, 0], [10, 10], [7, 10], [7, 3],
                     [3, 3], [3, 10], [0, 10], [0, 0]])
        tri = Polygon([[1, 8], [9, 8], [5, 7], [1, 8]])
        inside = Polygon([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]])
        self._pairs(spark, [u], [tri, inside], "st_contains")

    def test_hole_vertex_reject(self, spark):
        # geometry in the donut hole: vertices are exterior (hole is not
        # interior) -> the screen may reject contains AND must agree on
        # intersects (no intersection at all)
        donut = Polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                        [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]])
        in_hole = box_poly(4.0, 4.0, 6.0, 6.0)
        in_ring = box_poly(1.0, 1.0, 2.0, 2.0)
        for pred in ("st_contains", "st_intersects"):
            self._pairs(spark, [donut], [in_hole, in_ring], pred)

    def test_touches_boundary_only(self, spark):
        # shared-edge neighbors: vertex screen must not short-circuit
        # touches (it only screens intersects/containment)
        a = box_poly(0.0, 0.0, 5.0, 5.0)
        b = box_poly(5.0, 0.0, 10.0, 5.0)
        c = box_poly(6.0, 0.0, 12.0, 5.0)
        self._pairs(spark, [a], [b, c], "st_touches")

    def test_within_mirror(self, spark):
        outer = box_poly(0.0, 0.0, 10.0, 10.0)
        inner = box_poly(2.0, 2.0, 3.0, 3.0)
        straddle = box_poly(9.0, 9.0, 11.0, 11.0)
        self._pairs(spark, [inner, straddle], [outer], "st_within")


class TestRectFastPath:
    """Broadcast joins over axis-aligned rectangles fold the exact
    predicate into codegen coordinate comparisons (no Python refine
    stage in the plan); any non-rectangle in the set falls back to the
    envelope-prefiltered Python refine with identical results."""

    def _pts(self, spark):
        rows = [(1, 5.0, 5.0),    # interior
                (2, 0.0, 5.0),    # on edge
                (3, 10.0, 10.0),  # corner
                (4, 11.0, 5.0)]   # outside
        return spark.createDataFrame(rows, "event_id int, lon double, lat double")

    def test_rect_plan_is_pure_jvm(self, spark):
        regs = spark.createDataFrame(
            [("R", bytearray(to_wkb(box_poly(0.0, 0.0, 10.0, 10.0))))],
            "region_id string, geom binary")
        out = spatial_join(self._pts(spark), regs, predicate="st_contains",
                           broadcast_regions=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # no Arrow/BatchEvalPython stage
        assert {r.event_id for r in out.collect()} == {1}

    def test_rect_boundary_semantics(self, spark):
        regs = spark.createDataFrame(
            [("R", bytearray(to_wkb(box_poly(0.0, 0.0, 10.0, 10.0))))],
            "region_id string, geom binary")
        expected = {"st_contains": {1}, "st_within": {1},
                    "st_intersects": {1, 2, 3}, "st_covers": {1, 2, 3},
                    "st_coveredBy": {1, 2, 3}}
        for pred, want in expected.items():
            got = {r.event_id for r in
                   spatial_join(self._pts(spark), regs, predicate=pred,
                                broadcast_regions=True).collect()}
            assert got == want, pred

    def test_mixed_set_falls_back_and_agrees(self, spark):
        # one rect + one triangle: all_rect is False, so the broadcast
        # path must route through the exact refine and agree with the
        # distributed (non-broadcast) plan
        tri = Polygon([[0, 0], [10, 0], [0, 10], [0, 0]])
        regs = spark.createDataFrame(
            [("R", bytearray(to_wkb(box_poly(0.0, 0.0, 10.0, 10.0)))),
             ("T", bytearray(to_wkb(tri)))],
            "region_id string, geom binary")
        pts = self._pts(spark)
        for pred in ("st_contains", "st_intersects"):
            bc = {(r.event_id, r.region_id) for r in
                  spatial_join(pts, regs, predicate=pred,
                               broadcast_regions=True).collect()}
            dist = {(r.event_id, r.region_id) for r in
                    spatial_join(pts, regs, predicate=pred).collect()}
            assert bc == dist, pred
        # (5,5) lies ON the triangle's hypotenuse: boundary, not interior
        bc = {(r.event_id, r.region_id) for r in
              spatial_join(pts, regs, predicate="st_contains",
                           broadcast_regions=True).collect()}
        assert ("1", "T") not in {(str(a), b) for a, b in bc}

    def test_bowtie_ring_is_not_a_rect(self, spark):
        # a self-intersecting "bowtie" traversal of the envelope's four
        # corners has the same vertex SET as the rectangle but a totally
        # different interior — it must NOT take the rect fast path, and
        # the broadcast plan must agree with the distributed plan
        from geomesa_spark.operators.join import _is_axis_rect
        bow = Polygon([[0, 0], [10, 10], [10, 0], [0, 10], [0, 0]])
        assert not _is_axis_rect(bow)
        assert _is_axis_rect(box_poly(0.0, 0.0, 10.0, 10.0))
        regs = spark.createDataFrame(
            [("B", bytearray(to_wkb(bow)))], "region_id string, geom binary")
        pts = self._pts(spark)
        for pred in ("st_contains", "st_intersects"):
            bc = {(r.event_id, r.region_id) for r in
                  spatial_join(pts, regs, predicate=pred,
                               broadcast_regions=True).collect()}
            dist = {(r.event_id, r.region_id) for r in
                    spatial_join(pts, regs, predicate=pred).collect()}
            assert bc == dist, pred
        # NOTE: a self-intersecting ring is an INVALID polygon, so the
        # exact predicate's classification of individual points is
        # engine-defined (as in JTS) — the contract asserted here is
        # that the broadcast plan routes through the SAME refine as the
        # distributed plan instead of folding to envelope comparisons.
