"""S2 cell structural laws (pattern of the reference's S2SFCTest):
Hilbert-curve bijectivity and adjacency, prefix/hierarchy containment,
center round-trips, face coverage, and cover soundness — the invariants
that pin the published S2 scheme without the S2 library present."""

from __future__ import annotations

import numpy as np

import pytest

from geomesa_spark.cells.s2 import (S2_MAX_LEVEL, _ij_to_pos,
                                    _pos_to_ij_arr, s2_cell_center,
                                    s2_cell_id, s2_cover_bbox,
                                    s2_cover_ranges, s2_decode,
                                    s2_parent, s2_token)


def _rand_points(n, rng):
    return rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)


class TestHilbert:
    def test_bijective_on_each_face(self):
        level = 4
        n = 1 << level
        for face in range(6):
            ii, jj = np.meshgrid(np.arange(n), np.arange(n))
            pos = _ij_to_pos(np.full(n * n, face), ii.ravel(), jj.ravel(),
                             level)
            assert sorted(pos.tolist()) == list(range(4 ** level)), face

    def test_adjacent_positions_are_adjacent_cells(self):
        """The defining Hilbert property: consecutive curve positions
        differ by exactly one step in i or j."""
        level = 5
        for face in range(6):
            pos = np.arange(4 ** level)
            i, j = _pos_to_ij_arr(np.full(len(pos), face), pos, level)
            di = np.abs(np.diff(i))
            dj = np.abs(np.diff(j))
            assert np.all(di + dj == 1), face

    def test_roundtrip_ij(self):
        rng = np.random.default_rng(21)
        level = 12
        n = 1 << level
        face = rng.integers(0, 6, 500)
        i = rng.integers(0, n, 500)
        j = rng.integers(0, n, 500)
        pos = _ij_to_pos(face, i, j, level)
        i2, j2 = _pos_to_ij_arr(face, pos, level)
        assert np.array_equal(i, i2) and np.array_equal(j, j2)


class TestCellId:
    def test_id_layout_and_determinism(self):
        rng = np.random.default_rng(22)
        lon, lat = _rand_points(2000, rng)
        a = s2_cell_id(lon, lat, 16)
        b = s2_cell_id(lon, lat, 16)
        assert np.array_equal(a, b)
        # sentinel bit position encodes the level
        shift = 2 * (S2_MAX_LEVEL - 16)
        assert np.all((a >> shift) & 1 == 1)
        assert np.all((a & ((np.int64(1) << shift) - 1)) == 0)

    def test_center_roundtrip(self):
        rng = np.random.default_rng(23)
        lon, lat = _rand_points(3000, rng)
        for level in (8, 16, 24):
            ids = s2_cell_id(lon, lat, level)
            clon, clat = s2_cell_center(ids, level)
            ids2 = s2_cell_id(clon, clat, level)
            assert np.array_equal(ids, ids2), level

    def test_prefix_hierarchy(self):
        """A point's coarse cell id = parent of its fine cell id (the
        quadkey-compatible prefix property the engine relies on)."""
        rng = np.random.default_rng(24)
        lon, lat = _rand_points(2000, rng)
        fine = s2_cell_id(lon, lat, 20)
        for parent_level in (4, 10, 16):
            coarse = s2_cell_id(lon, lat, parent_level)
            assert np.array_equal(s2_parent(fine, 20, parent_level),
                                  coarse), parent_level

    def test_all_faces_reached(self):
        rng = np.random.default_rng(25)
        lon = rng.uniform(-180, 180, 5000)
        lat = rng.uniform(-90, 90, 5000)
        face, _, _ = s2_decode(s2_cell_id(lon, lat, 10), 10)
        assert set(face.tolist()) == set(range(6))
        # poles land on the up/down faces
        f_n, _, _ = s2_decode(s2_cell_id([0.0], [89.9], 10), 10)
        f_s, _, _ = s2_decode(s2_cell_id([0.0], [-89.9], 10), 10)
        assert f_n[0] == 2 and f_s[0] == 5

    def test_equal_area_ish(self):
        """The quadratic projection bounds cell-population skew: uniform
        sphere points spread across level-6 cells with max/mean bounded
        (true S2 max/min cell area ratio at fine levels is ~2.08)."""
        rng = np.random.default_rng(26)
        # uniform on the sphere via normal vectors
        xyz = rng.standard_normal((200_000, 3))
        xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
        lon = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
        lat = np.degrees(np.arcsin(np.clip(xyz[:, 2], -1, 1)))
        ids = s2_cell_id(lon, lat, 5)
        _, counts = np.unique(ids, return_counts=True)
        assert len(counts) == 6 * 4 ** 5  # every cell hit (~33 pts/cell)
        assert counts.max() / counts.mean() < 3.0

    def test_token(self):
        ids = s2_cell_id([0.0], [0.0], 16)
        t = s2_token(int(ids[0]))
        assert 1 <= len(t) <= 16 and t == t.rstrip("0")


def _in_ranges(ids: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    hit = np.zeros(len(ids), dtype=bool)
    for lo, hi in ranges.tolist():
        hit |= (ids >= lo) & (ids <= hi)
    return hit


class TestCover:
    def test_cover_ranges_soundness(self):
        rng = np.random.default_rng(27)
        for (qx0, qy0, qx1, qy1) in [(-20, -10, 30, 25),
                                     (100, 40, 140, 60),
                                     (-179, 60, 179, 89),   # polar band
                                     (170, -10, 179.9, 10),  # near dateline
                                     (-5, -5, 5, 5)]:
            level = 8
            ranges = s2_cover_ranges(qx0, qy0, qx1, qy1, level)
            assert len(ranges) <= 4096
            assert np.all(ranges[:, 0] <= ranges[:, 1])
            lon = rng.uniform(qx0, qx1, 4000)
            lat = rng.uniform(qy0, qy1, 4000)
            ids = s2_cell_id(lon, lat, level)
            assert _in_ranges(ids, ranges).all(), (qx0, qy0, qx1, qy1)

    def test_cover_bbox_matches_ranges(self):
        level = 8
        cells = s2_cover_bbox(-20, -10, 30, 25, level, max_cells=50_000)
        ranges = s2_cover_ranges(-20, -10, 30, 25, level, 50_000)
        assert _in_ranges(cells, ranges).all()
        # and the expansion is exactly the ids the ranges contain
        step = 1 << (2 * (S2_MAX_LEVEL - level) + 1)
        total = sum((int(hi) - int(lo)) // step + 1
                    for lo, hi in ranges.tolist())
        assert total == len(cells)

    def test_cover_selectivity(self):
        cover = s2_cover_bbox(-5, -5, 5, 5, 8)
        assert 0 < len(cover) < 6 * 4 ** 8 * 0.05

    def test_cover_budget(self):
        cover = s2_cover_bbox(-180, -90, 180, 90, 6, max_cells=100_000)
        assert len(cover) == 6 * 4 ** 6  # whole world = every cell

    def test_cover_ranges_bounded_near_global(self):
        # the ADVICE repro: near-global bbox at level 10 must stay
        # bounded (was 6.2M cells / ~12 s before the range form)
        ranges = s2_cover_ranges(-179.9, -89.9, 179.9, 89.9, 10,
                                 max_ranges=4096)
        assert 0 < len(ranges) <= 4096
        rng = np.random.default_rng(28)
        lon, lat = rng.uniform(-179, 179, 2000), rng.uniform(-89, 89, 2000)
        ids = s2_cell_id(lon, lat, 10)
        assert _in_ranges(ids, ranges).all()

    def test_cover_bbox_raises_over_budget(self):
        with pytest.raises(ValueError, match="s2_cover_ranges"):
            s2_cover_bbox(-179.9, -89.9, 179.9, 89.9, 10, max_cells=4096)
