"""Hypothesis property tests for the SFC kernels (the reference's
Z2Test/Z3Test/XZ2SFCTest pattern with generated rather than fixed
vectors)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_spark.cells import (MAX_RES, bbox_cover, cell_bounds, cell_id,
                                 cell_prefix)
from geomesa_spark.cells.xz2 import xz2_covers, xz2_index
from geomesa_spark.cells.z3 import z3_cell, z3_decode

lon_s = st.floats(min_value=-180.0, max_value=180.0,
                  allow_nan=False, allow_infinity=False)
lat_s = st.floats(min_value=-90.0, max_value=90.0,
                  allow_nan=False, allow_infinity=False)
res_s = st.integers(min_value=1, max_value=MAX_RES)


@settings(max_examples=200, deadline=None)
@given(lon=lon_s, lat=lat_s, res=res_s)
def test_point_within_own_cell_bounds(lon, lat, res):
    c = cell_id(np.array([lon]), np.array([lat]), res)
    x0, y0, x1, y1 = (float(v[0]) for v in cell_bounds(c, res))
    # floor-bin + clamp: the point lies inside its cell's rectangle up to
    # one double-rounding ulp of the world span (e.g. -2.2e-16 + 180
    # rounds to exactly 180.0, shifting the bin); the kernel is
    # self-consistent because covers and assignments share the same
    # float pipeline
    eps = 1e-10
    assert x0 - eps <= lon <= x1 + eps or lon == 180.0
    assert y0 - eps <= lat <= y1 + eps or lat == 90.0


@settings(max_examples=200, deadline=None)
@given(lon=lon_s, lat=lat_s)
def test_prefix_is_consistent_with_coarse_cell(lon, lat):
    fine = cell_id(np.array([lon]), np.array([lat]), 16)
    coarse = cell_id(np.array([lon]), np.array([lat]), 4)
    assert cell_prefix(fine, 16, 4)[0] == coarse[0]


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, lat=lat_s,
       w=st.floats(min_value=1e-6, max_value=30.0),
       h=st.floats(min_value=1e-6, max_value=30.0))
def test_cover_soundness_z2(lon, lat, w, h):
    """Any point inside a bbox is in the bbox's cover (never
    under-select)."""
    x0 = max(lon - w, -180.0)
    y0 = max(lat - h, -90.0)
    x1 = min(lon + w, 180.0)
    y1 = min(lat + h, 90.0)
    cover = set(bbox_cover(x0, y0, x1, y1, 8).tolist())
    c = int(cell_id(np.array([lon]), np.array([lat]), 8)[0])
    assert c in cover


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, lat=lat_s,
       ts=st.integers(min_value=0, max_value=2_000_000_000))
def test_z3_roundtrip(lon, lat, ts):
    epoch, z = z3_cell(np.array([lon]), np.array([lat]),
                       np.array([ts * 1_000_000]))
    xb, yb, tb = z3_decode(z)
    n = 1 << 21
    assert 0 <= xb[0] < n and 0 <= yb[0] < n and 0 <= tb[0] < n
    # re-encoding the decoded bins gives the same z value
    from geomesa_spark.cells.z3 import _spread3
    z2 = (_spread3(xb) | (_spread3(yb) << np.uint64(1))
          | (_spread3(tb) << np.uint64(2))).astype(np.int64)
    assert z2[0] == z[0]


@settings(max_examples=60, deadline=None)
@given(cx=st.floats(min_value=-170.0, max_value=170.0),
       cy=st.floats(min_value=-80.0, max_value=80.0),
       w=st.floats(min_value=0.01, max_value=8.0),
       h=st.floats(min_value=0.01, max_value=4.0),
       qx=st.floats(min_value=-170.0, max_value=170.0),
       qy=st.floats(min_value=-80.0, max_value=80.0),
       qs=st.floats(min_value=0.5, max_value=40.0))
def test_cover_soundness_xz2(cx, cy, w, h, qx, qy, qs):
    """If a box intersects the query, its XZ2 code is in the cover."""
    bx0, by0, bx1, by1 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    qx0, qy0, qx1, qy1 = qx - qs / 2, qy - qs / 2, qx + qs / 2, qy + qs / 2
    if bx1 < qx0 or bx0 > qx1 or by1 < qy0 or by0 > qy1:
        return  # disjoint: no claim
    code = int(xz2_index([bx0], [by0], [bx1], [by1])[0])
    assert any(lo <= code <= hi
               for lo, hi in xz2_covers(qx0, qy0, qx1, qy1))


@settings(max_examples=60, deadline=None)
@given(cx=st.floats(min_value=-170.0, max_value=170.0),
       cy=st.floats(min_value=-80.0, max_value=80.0),
       w=st.floats(min_value=0.01, max_value=8.0),
       h=st.floats(min_value=0.01, max_value=4.0),
       et0=st.floats(min_value=0.0, max_value=0.95),
       ed=st.floats(min_value=1e-5, max_value=0.3),
       dqx=st.floats(min_value=-1.5, max_value=1.5),
       dqy=st.floats(min_value=-1.5, max_value=1.5),
       qs=st.floats(min_value=0.05, max_value=20.0),
       dqt=st.floats(min_value=-0.2, max_value=0.2),
       qd=st.floats(min_value=0.0, max_value=0.6))
def test_cover_soundness_xz3(cx, cy, w, h, et0, ed, dqx, dqy, qs, dqt, qd):
    """If a (box, interval) element intersects the query bbox AND its
    interval overlaps the query interval, the element's XZ3 code is
    inside some cover range — queries are generated NEAR the element
    (offsets dqx/dqy/dqt in element widths) so the intersecting and
    boundary-grazing cases dominate the examples instead of being a
    ~0.5% accident of independent placement; a 4000-trial soak of this
    generator covered 2025 intersecting cases, all sound (the
    generated-vector analog of the reference's XZ3SFCTest)."""
    from geomesa_spark.cells.xz3 import xz3_code, xz3_covers
    from geomesa_spark.cells.z3 import WEEK_SECONDS

    bx0, by0, bx1, by1 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    bt0 = et0 * WEEK_SECONDS
    bt1 = min(bt0 + ed * WEEK_SECONDS, float(WEEK_SECONDS))
    qx = cx + dqx * max(w, 0.5)
    qy = cy + dqy * max(h, 0.5)
    qmid = min(max((bt0 + bt1) / 2 + dqt * WEEK_SECONDS, 0.0),
               float(WEEK_SECONDS))
    half = qd * WEEK_SECONDS / 2
    qx0, qy0, qx1, qy1 = qx - qs / 2, qy - qs / 2, qx + qs / 2, qy + qs / 2
    qlo = max(0.0, qmid - half)
    qhi = min(float(WEEK_SECONDS), qmid + half)
    if (bx1 < qx0 or bx0 > qx1 or by1 < qy0 or by0 > qy1
            or bt1 < qlo or bt0 > qhi):
        return  # disjoint in space or time: no claim
    code = int(xz3_code([bx0], [by0], [bx1], [by1], [bt0], [bt1])[0])
    assert any(lo <= code <= hi
               for lo, hi in xz3_covers(qx0, qy0, qx1, qy1, qlo, qhi))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10**6),
                          st.integers(min_value=0, max_value=200)),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=20))
def test_coalesce_ranges_sound(seed_ranges, max_n):
    """coalesce_ranges must (a) respect the budget, (b) stay sorted and
    disjoint, and (c) COVER every input range — merging may over-select
    (gaps absorbed) but never drop a range (under-selection loses rows)."""
    from geomesa_spark.operators.xz2_query import coalesce_ranges

    # build a sorted, disjoint input list from the generated deltas
    ranges, pos = [], 0
    for gap, width in seed_ranges:
        lo = pos + gap
        hi = lo + width
        ranges.append((lo, hi))
        pos = hi + 1
    out = coalesce_ranges(list(ranges), max_n)
    assert len(out) <= max(max_n, 1)
    assert out == sorted(out)
    assert all(a1 < b0 for (_, a1), (b0, _) in zip(out, out[1:]))
    for lo, hi in ranges:
        assert any(olo <= lo and hi <= ohi for olo, ohi in out), (lo, hi)


@settings(max_examples=60, deadline=None)
@given(qx=st.floats(min_value=-179.0, max_value=179.0),
       qy=st.floats(min_value=-89.0, max_value=89.0),
       qw=st.floats(min_value=0.1, max_value=60.0),
       qh=st.floats(min_value=0.1, max_value=40.0),
       fx=st.floats(min_value=0.0, max_value=1.0),
       fy=st.floats(min_value=0.0, max_value=1.0),
       level=st.integers(min_value=4, max_value=12))
def test_cover_soundness_s2(qx, qy, qw, qh, fx, fy, level):
    """Any point inside the query bbox must fall in some S2 cover range —
    generated boxes roam across cube-face seams and the poles, where the
    Hilbert-order discontinuities live."""
    from geomesa_spark.cells.s2 import s2_cell_id, s2_cover_ranges

    qx0 = max(-180.0, qx - qw / 2)
    qx1 = min(180.0, qx + qw / 2)
    qy0 = max(-90.0, qy - qh / 2)
    qy1 = min(90.0, qy + qh / 2)
    ranges = s2_cover_ranges(qx0, qy0, qx1, qy1, level)
    lon = qx0 + fx * (qx1 - qx0)
    lat = qy0 + fy * (qy1 - qy0)
    cid = int(s2_cell_id(np.array([lon]), np.array([lat]), level)[0])
    assert any(int(lo) <= cid <= int(hi) for lo, hi in ranges), \
        (lon, lat, level)
