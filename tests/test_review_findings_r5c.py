"""Regression tests for the fourth round-5 adversarial review batch
(geo/ measures + predicates sweep).

Each test pins one fixed defect:
- closest_point returned a positive-distance vertex for INTERSECTING
  inputs whose representative vertices are mutually exterior (crossing
  boundaries, or a's parts strictly inside b) — JTS DistanceOp returns a
  distance-0 point of the intersection for any intersecting pair.
- from_wkt stripped the Z/M/ZM dimension token without using it, so
  "POINT Z (1 2 3)" parsed the Z ordinate as M and "POINT ZM (1 2 3 4)"
  dropped the true M (JTS WKTReader: a bare third ordinate is Z).
"""

import numpy as np

from geomesa_spark.geo.measures import closest_point, distance
from geomesa_spark.geo.model import Polygon
from geomesa_spark.geo.predicates import locate


def _sq(x0, y0, x1, y1):
    return Polygon(np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float))


class TestClosestPointIntersecting:
    def test_crossing_boundaries_returns_shared_point(self):
        # boundaries cross at x=0 and x=10; every vertex of each polygon
        # is strictly outside the other
        a = _sq(0, 0, 10, 10)
        b = _sq(-5, 4, 15, 6)
        assert distance(a, b) == 0.0
        p = closest_point(a, b)
        assert locate(a, p.x, p.y) != "E"
        assert locate(b, p.x, p.y) != "E"

    def test_a_inside_b_returns_point_of_a(self):
        a = _sq(3, 3, 4, 4)
        b = _sq(0, 0, 10, 10)
        p = closest_point(a, b)
        assert locate(a, p.x, p.y) != "E"
        assert locate(b, p.x, p.y) != "E"

    def test_disjoint_unchanged(self):
        a = _sq(0, 0, 1, 1)
        b = _sq(3, 0, 4, 1)
        p = closest_point(a, b)
        # nearest point ON a to b is the right edge of a
        assert (p.x, p.y) == (1.0, 0.0) or p.x == 1.0


class TestWktDimensionToken:
    def test_point_z_drops_z(self):
        from geomesa_spark.geo.io import from_wkt
        g = from_wkt("POINT Z (1 2 3)")
        assert (g.x, g.y, g.m) == (1.0, 2.0, None)

    def test_point_zm_keeps_m(self):
        from geomesa_spark.geo.io import from_wkt
        g = from_wkt("POINT ZM (1 2 3 4)")
        assert (g.x, g.y, g.m) == (1.0, 2.0, 4.0)

    def test_point_m_keeps_m(self):
        from geomesa_spark.geo.io import from_wkt
        g = from_wkt("POINT M (1 2 9)")
        assert (g.x, g.y, g.m) == (1.0, 2.0, 9.0)

    def test_bare_three_ordinates_is_z(self):
        from geomesa_spark.geo.io import from_wkt
        g = from_wkt("POINT (1 2 3)")
        assert (g.x, g.y, g.m) == (1.0, 2.0, None)

    def test_bare_four_ordinates_is_zm(self):
        from geomesa_spark.geo.io import from_wkt
        g = from_wkt("POINT (1 2 3 4)")
        assert (g.x, g.y, g.m) == (1.0, 2.0, 4.0)
