"""Voronoi (operators/voronoi.py): partition-of-box area oracle, site
containment, symmetric-grid closed form, per-group independence."""

import numpy as np
import pytest

from spandex_spark.operators.voronoi import voronoi_polygons


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "grp long, pid long, lon double, lat double")


def test_two_sites_half_planes(spark):
    out = {r["pid"]: r for r in voronoi_polygons(
        _df(spark, [(0, 1, 0.0, 0.0), (0, 2, 2.0, 0.0)]),
        group_col="grp", point_id_col="pid",
        bbox=(-1.0, -1.0, 3.0, 1.0)).collect()}
    # bisector x=1 splits the 4x2 box into two 2x2 halves
    assert out[1]["area"] == pytest.approx(4.0)
    assert out[2]["area"] == pytest.approx(4.0)
    assert max(out[1]["cell"]["xs"]) == pytest.approx(1.0)
    assert min(out[2]["cell"]["xs"]) == pytest.approx(1.0)


def test_grid_sites_equal_cells_and_partition(spark):
    rows = [(0, y * 4 + x, float(x), float(y))
            for y in range(4) for x in range(4)]
    out = voronoi_polygons(_df(spark, rows), group_col="grp",
                           point_id_col="pid",
                           bbox=(-0.5, -0.5, 3.5, 3.5)).collect()
    assert len(out) == 16
    areas = [r["area"] for r in out]
    # symmetric grid in a grid-aligned box: every cell is a unit square
    assert all(a == pytest.approx(1.0) for a in areas)
    assert sum(areas) == pytest.approx(16.0)  # exact partition of the box
    # each cell contains its own site
    from spandex_spark import geom as G
    for r in out:
        c = r["cell"]
        inside = G.points_in_rings(
            np.array([r["lon"]]), np.array([r["lat"]]),
            np.asarray(c["xs"]), np.asarray(c["ys"]), None)
        assert inside[0]


def test_random_sites_partition_box(spark):
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 10, (40, 2))
    rows = [(0, i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    out = voronoi_polygons(_df(spark, rows), group_col="grp",
                           point_id_col="pid",
                           bbox=(0.0, 0.0, 10.0, 10.0)).collect()
    assert sum(r["area"] for r in out) == pytest.approx(100.0, abs=1e-6)
    # nearest-site check on a probe lattice: the cell owning each probe
    # is its nearest site (definition of Voronoi)
    from spandex_spark import geom as G
    probes = np.stack(np.meshgrid(np.linspace(0.3, 9.7, 12),
                                  np.linspace(0.3, 9.7, 12)), -1).reshape(-1, 2)
    cells = {r["pid"]: r["cell"] for r in out if r["cell"] is not None}
    for qx, qy in probes:
        owner = [pid for pid, c in cells.items()
                 if G.points_in_rings(np.array([qx]), np.array([qy]),
                                      np.asarray(c["xs"]),
                                      np.asarray(c["ys"]), None)[0]]
        d = np.hypot(pts[:, 0] - qx, pts[:, 1] - qy)
        if len(owner) == 1:  # probes on cell edges may land in 0 or 2
            assert owner[0] == int(np.argmin(d))


def test_groups_independent_and_singleton(spark):
    rows = [(0, 1, 0.0, 0.0), (0, 2, 1.0, 0.0), (7, 3, 100.0, 100.0)]
    out = {r["pid"]: r for r in voronoi_polygons(
        _df(spark, rows), group_col="grp", point_id_col="pid",
        margin=0.5).collect()}
    assert out[3]["area"] == pytest.approx(1.0)  # whole 1x1 padded box
    # group 0's cells never reach group 7's site
    assert max(out[1]["cell"]["xs"]) < 50
