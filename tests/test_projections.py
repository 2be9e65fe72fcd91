"""Conic / polar projection tests: Snyder published numeric examples,
round-trip laws, and the defining geometric invariants (conformality for
LCC/PS, equal-area for Albers) checked by finite differences."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geomesa_spark.geo import from_wkt
from geomesa_spark.geo.process import (ELLIPSOIDS, PROJ_REGISTRY, _Albers,
                                       _Lcc2sp, _PolarStereoB,
                                       _registry_projection,
                                       register_projection, transform)


class TestSnyderExamples:
    """Worked examples from Snyder, 'Map Projections — A Working
    Manual' (USGS PP 1395): pp. 295-296 (LCC), 291-292 (Albers),
    314-315 (polar stereographic)."""

    def test_lcc_clarke1866(self):
        a, e2 = ELLIPSOIDS["CLARKE1866"]
        p = _Lcc2sp(a, e2, lat0=23.0, lon0=-96.0, sp1=33.0, sp2=45.0,
                    fe=0.0, fn=0.0)
        out = p.forward(np.array([[-75.0, 35.0]]))
        assert abs(out[0, 0] - 1894410.9) < 0.5
        assert abs(out[0, 1] - 1564649.5) < 0.5
        back = p.inverse(out)
        assert np.allclose(back, [[-75.0, 35.0]], atol=1e-9)

    def test_albers_clarke1866(self):
        a, e2 = ELLIPSOIDS["CLARKE1866"]
        p = _Albers(a, e2, lat0=23.0, lon0=-96.0, sp1=29.5, sp2=45.5,
                    fe=0.0, fn=0.0)
        out = p.forward(np.array([[-75.0, 35.0]]))
        assert abs(out[0, 0] - 1885472.7) < 0.5
        assert abs(out[0, 1] - 1535925.0) < 0.5
        assert np.allclose(p.inverse(out), [[-75.0, 35.0]], atol=1e-9)

    def test_tmerc_british_national_grid(self):
        """OS 'A guide to coordinate systems in Great Britain' worked
        example: OSGB36 geodetic -> National Grid E/N to the mm."""
        from geomesa_spark.geo.process import _Tmerc
        a, e2 = ELLIPSOIDS["AIRY1830"]
        tm = _Tmerc(a, e2, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                    fe=400000.0, fn=-100000.0)
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        out = tm.forward(np.array([[lon, lat]]))
        assert abs(out[0, 0] - 651409.903) < 0.002
        assert abs(out[0, 1] - 313177.270) < 0.002
        assert np.allclose(tm.inverse(out), [[lon, lat]], atol=1e-9)

    def test_bng_helmert_datum(self):
        """EPSG:27700 applies the OS 7-parameter WGS84->OSGB36 shift:
        exact round-trip, and the shift moves coords by the expected
        ~120 m over London."""
        from geomesa_spark.geo.process import _Tmerc
        p = _registry_projection("27700")
        w = np.array([[-0.1276, 51.5072]])
        bng = p.forward(w)
        assert np.abs(p.inverse(bng) - w).max() < 1e-7
        a, e2 = ELLIPSOIDS["AIRY1830"]
        raw = _Tmerc(a, e2, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                     fe=400000.0, fn=-100000.0).forward(w)
        shift = float(np.hypot(*(bng - raw)[0]))
        assert 80 < shift < 180

    def test_polar_stereo_intl1924(self):
        a, e2 = ELLIPSOIDS["INTL1924"]
        p = _PolarStereoB(a, e2, latf=-71.0, lon0=-100.0, fe=0.0, fn=0.0)
        out = p.forward(np.array([[150.0, -75.0]]))
        assert abs(out[0, 0] - -1540033.6) < 0.5
        assert abs(out[0, 1] - -560526.4) < 0.5
        assert np.allclose(p.inverse(out), [[150.0, -75.0]], atol=1e-9)


def _local_scales(proj, lon, lat):
    """(meridian scale h, parallel scale k) by central differences
    against ellipsoidal ground distances."""
    a = proj.a
    e2 = getattr(proj, "e2", proj.e ** 2)
    phi = math.radians(lat)
    d = 1e-6  # degrees
    pts = np.array([[lon - d, lat], [lon + d, lat],
                    [lon, lat - d], [lon, lat + d]])
    xy = proj.forward(pts)
    dpar = np.hypot(*(xy[1] - xy[0]))
    dmer = np.hypot(*(xy[3] - xy[2]))
    sin2 = math.sin(phi) ** 2
    # radii of curvature: N (prime vertical), M (meridian)
    N = a / math.sqrt(1 - e2 * sin2)
    M = a * (1 - e2) / (1 - e2 * sin2) ** 1.5
    ground_par = 2 * math.radians(d) * N * math.cos(phi)
    ground_mer = 2 * math.radians(d) * M
    return dmer / ground_mer, dpar / ground_par


class TestInvariants:
    def test_lcc_conformal_and_unit_scale_at_parallels(self):
        p = _registry_projection("2154")  # Lambert-93
        for lon, lat in [(3.0, 44.0), (-1.0, 49.0)]:  # on the sps
            h, k = _local_scales(p, lon, lat)
            assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-6
        for lon, lat in [(2.35, 48.85), (5.4, 43.3), (-4.5, 48.4)]:
            h, k = _local_scales(p, lon, lat)
            assert abs(h - k) < 1e-6  # conformal: isotropic scale
        h_mid, _ = _local_scales(p, 3.0, 46.5)  # between sps: k < 1
        assert h_mid < 1.0

    def test_albers_equal_area_everywhere(self):
        p = _registry_projection("5070")  # Conus Albers
        for lon, lat in [(-96.0, 29.5), (-120.0, 45.5), (-75.0, 35.0),
                         (-100.0, 23.0), (-85.0, 48.0)]:
            h, k = _local_scales(p, lon, lat)
            assert abs(h * k - 1) < 1e-6, (lon, lat, h * k)

    def test_polar_stereo_conformal_unit_at_latf(self):
        p = _registry_projection("3031")  # Antarctic PS, latf=-71
        for lon in (-120.0, 0.0, 77.0):
            h, k = _local_scales(p, lon, -71.0)
            assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-6
        for lon, lat in [(45.0, -80.0), (170.0, -88.0)]:
            h, k = _local_scales(p, lon, lat)
            assert abs(h - k) < 1e-6

    def test_roundtrip_all_registered(self):
        rng = np.random.default_rng(3)
        domains = {"2154": (-4, 8, 42, 51), "3347": (-120, -60, 45, 80),
                   "3978": (-130, -60, 42, 82), "5070": (-124, -67, 25, 49),
                   "3577": (113, 153, -43, -10), "3031": (-180, 180, -89, -61),
                   "3413": (-180, 180, 61, 89), "3995": (-180, 180, 61, 89),
                   "27700": (-7, 2, 50, 59), "2193": (167, 178, -47, -35)}
        for code, (x0, x1, y0, y1) in domains.items():
            p = _registry_projection(code)
            lon = rng.uniform(x0, x1, 200)
            lat = rng.uniform(y0, y1, 200)
            c = np.column_stack([lon, lat])
            back = p.inverse(p.forward(c))
            assert np.allclose(back, c, atol=1e-8), code


class TestTransformSurface:
    def test_transform_point_lambert93(self):
        g = from_wkt("POINT (2.35 48.85)")
        out = transform(g, "EPSG:4326", "EPSG:2154")
        # Paris in Lambert-93: X ~ 651.5 km, Y ~ 6.862 Mm (coarse sanity
        # envelope; exactness is pinned by the Snyder examples above)
        assert 600000 < out.x < 700000
        assert 6800000 < out.y < 6900000
        rt = transform(out, "EPSG:2154", "EPSG:4326")
        assert abs(rt.x - 2.35) < 1e-8 and abs(rt.y - 48.85) < 1e-8

    def test_transform_chain_between_registered(self):
        g = from_wkt("POINT (-100 40)")
        out = transform(g, "EPSG:4326", "EPSG:5070")
        back = transform(out, "EPSG:5070", "EPSG:4326")
        assert abs(back.x + 100) < 1e-8 and abs(back.y - 40) < 1e-8

    def test_unknown_code_raises_and_register_extends(self):
        g = from_wkt("POINT (0 0)")
        with pytest.raises(NotImplementedError):
            transform(g, "EPSG:4326", "EPSG:99999")
        register_projection("99999", "lcc2sp", "WGS84",
                            dict(lat0=0.0, lon0=0.0, sp1=20.0, sp2=40.0,
                                 fe=0.0, fn=0.0))
        try:
            out = transform(g, "EPSG:4326", "EPSG:99999")
            back = transform(out, "EPSG:99999", "EPSG:4326")
            assert abs(back.x) < 1e-8 and abs(back.y) < 1e-8
        finally:
            PROJ_REGISTRY.pop("99999", None)
