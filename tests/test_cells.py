"""Cell-index tests: roundtrips, hierarchy, covering (SURVEY.md §4.3)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from spandex_spark import cells, geom


class TestRoundtrip:
    def test_xy_roundtrip(self):
        rng = np.random.default_rng(42)
        for level in [0, 1, 5, 12, 29]:
            n = 1 << level
            x = rng.integers(0, n, 200)
            y = rng.integers(0, n, 200)
            c = cells.xy_to_cell(x, y, level)
            gx, gy = cells.cell_xy(c)
            np.testing.assert_array_equal(gx, x)
            np.testing.assert_array_equal(gy, y)
            np.testing.assert_array_equal(cells.cell_level(c), level)

    def test_cell_of_in_bounds(self):
        rng = np.random.default_rng(1)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        c = cells.cell_of(lon, lat, 10)
        lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
        assert ((lon0 <= lon) & (lon < lon1 + 1e-9)).all()
        assert ((lat0 <= lat) & (lat < lat1 + 1e-9)).all()

    @given(st.floats(-180, 179.999), st.floats(-90, 89.999), st.integers(0, 29))
    @settings(max_examples=100, deadline=None)
    def test_point_always_in_own_cell(self, lon, lat, level):
        c = cells.cell_of(np.array([lon]), np.array([lat]), level)
        lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
        # 1-ulp slack: grid_coords rounds (lon+180)/360*2^L; points within one
        # ulp of a cell edge may land either side — consistently for points
        # AND covers (both use grid_coords), so joins are unaffected.
        eps = 1e-9
        assert lon0[0] - eps <= lon < lon1[0] + eps or lon == 180.0
        assert lat0[0] - eps <= lat < lat1[0] + eps or lat == 90.0


class TestHierarchy:
    def test_parent_contains_child(self):
        rng = np.random.default_rng(2)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        child = cells.cell_of(lon, lat, 12)
        par = cells.parent(child, 8)
        direct = cells.cell_of(lon, lat, 8)
        np.testing.assert_array_equal(par, direct)

    def test_parent_is_prefix(self):
        c = cells.cell_of(np.array([3.7]), np.array([-42.1]), 20)
        p = cells.parent(c, 18)
        assert (int(c[0]) & cells.MORTON_MASK) >> 4 == int(p[0]) & cells.MORTON_MASK

    def test_cells_positive_and_sortable(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-180, 180, 100)
        lat = rng.uniform(-90, 90, 100)
        for level in [0, 15, 29]:
            c = cells.cell_of(lon, lat, level)
            assert (c > 0).all() or level == 0


class TestCover:
    def test_cover_bbox_counts(self):
        # a 1x1 deg box at level 9 (cell ~0.70 x 0.35 deg) spans 2-3 x 3-4 cells
        got = cells.cover_bbox(0.0, 0.0, 1.0, 1.0, 9)
        assert 4 <= got.shape[0] <= 12

    def test_cover_polygon_superset_of_sample_points(self):
        """Property (SURVEY.md §5.2): cover(polygon) ⊇ cells of interior points."""
        rng = np.random.default_rng(4)
        xs = np.array([0.0, 3.0, 3.0, 1.5, 1.5, 0.0])
        ys = np.array([0.0, 0.0, 1.5, 1.5, 3.0, 3.0])
        for level in [7, 9, 11]:
            cover = set(cells.cover_polygon(xs, ys, level).tolist())
            px = rng.uniform(0, 3, 2000)
            py = rng.uniform(0, 3, 2000)
            inside = geom.points_in_polygon(px, py, xs, ys)
            pc = cells.cell_of(px[inside], py[inside], level)
            assert set(pc.tolist()) <= cover

    def test_cover_excludes_far_cells(self):
        # L-shape: the notch corner cells should be excluded at fine level
        xs = np.array([0.0, 8.0, 8.0, 4.0, 4.0, 0.0])
        ys = np.array([0.0, 0.0, 4.0, 4.0, 8.0, 8.0])
        lvl = 9
        cov = cells.cover_polygon(xs, ys, lvl)
        notch = cells.cell_of(np.array([7.0]), np.array([7.0]), lvl)
        assert int(notch[0]) not in set(cov.tolist())

    def test_level_for_extent(self):
        lvl = cells.level_for_extent(1.0)
        size = 360.0 / (1 << lvl)
        assert 0.2 < size < 2.0


class TestBboxCellRanges:
    def test_superset_of_cover_and_coalesced(self):
        bbox = (-3.2, 1.1, 4.7, 8.9)
        for level in (6, 10, 14):
            ranges = cells.bbox_cell_ranges(*bbox, level, max_ranges=64)
            assert len(ranges) <= 64
            # exact cover cells all fall inside some interval
            cov = cells.cover_bbox(*bbox, level)
            for c in cov.tolist():
                assert any(lo <= c <= hi for lo, hi in ranges)
            # intervals are sorted, disjoint, and maximally coalesced
            for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
                assert a1 < b0 and a1 + 1 < b0
            # every interval bound is a valid level-`level` cell id
            for lo, hi in ranges:
                assert int(cells.cell_level(np.int64(lo))) == level
                assert int(cells.cell_level(np.int64(hi))) == level

    def test_tiny_bbox_single_range(self):
        r = cells.bbox_cell_ranges(10.0, 10.0, 10.001, 10.001, 20)
        assert len(r) >= 1
        c = int(cells.cell_of(np.array([10.0005]), np.array([10.0005]), 20)[0])
        assert any(lo <= c <= hi for lo, hi in r)

    def test_no_false_negatives_random(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            x0, y0 = rng.uniform(-170, 160), rng.uniform(-80, 70)
            w, h = rng.uniform(0.01, 20), rng.uniform(0.01, 20)
            level = int(rng.integers(4, 18))
            ranges = cells.bbox_cell_ranges(x0, y0, x0 + w, y0 + h, level,
                                            max_ranges=32)
            assert len(ranges) <= 32
            px = rng.uniform(x0, x0 + w, 200)
            py = rng.uniform(y0, y0 + h, 200)
            pc = cells.cell_of(px, py, level)
            for c in pc.tolist():
                assert any(lo <= c <= hi for lo, hi in ranges)


class TestPolygonCellRanges:
    def test_lshape_skips_notch_and_no_false_negatives(self):
        # L-shape: [0,8]x[0,4] + [0,4]x[4,8]; the notch [4,8]x[4,8] is
        # inside the bbox but outside the region
        xs = np.array([0.0, 8.0, 8.0, 4.0, 4.0, 0.0])
        ys = np.array([0.0, 0.0, 4.0, 4.0, 8.0, 8.0])
        level = 12
        ranges = cells.polygon_cell_ranges(xs, ys, level, max_ranges=64)
        bbox_ranges = cells.bbox_cell_ranges(0.0, 0.0, 8.0, 8.0, level,
                                             max_ranges=64)
        covered = lambda rs: sum(hi - lo + 1 for lo, hi in rs)
        assert covered(ranges) < covered(bbox_ranges)
        # deep-notch cells are excluded...
        notch = int(cells.cell_of(np.array([7.0]), np.array([7.0]), level)[0])
        assert not any(lo <= notch <= hi for lo, hi in ranges)
        # ...and every point of the region is still planned
        rng = np.random.default_rng(2)
        px = rng.uniform(0, 8, 3000); py = rng.uniform(0, 8, 3000)
        from spandex_spark import geom
        inside = geom.points_in_polygon(px, py, xs, ys)
        pc = cells.cell_of(px[inside], py[inside], level)
        for c in pc.tolist():
            assert any(lo <= c <= hi for lo, hi in ranges)
