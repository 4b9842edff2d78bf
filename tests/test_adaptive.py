"""Adaptive quadtree cells (operators/adaptive.py): bounded occupancy,
coarse cells where sparse, prefix compatibility, coincident heaps,
partitioning invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark import cells as C
from spandex_spark.operators.adaptive import adaptive_cells


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rows)],
        "pid long, lon double, lat double")


def _clustered(n_dense=400, n_sparse=50, seed=3):
    rng = np.random.default_rng(seed)
    dense = rng.uniform([1.0, 1.0], [1.02, 1.02], size=(n_dense, 2))
    sparse = rng.uniform([-170, -80], [170, 80], size=(n_sparse, 2))
    return [tuple(p) for p in np.vstack([dense, sparse])]


def test_occupancy_bounded_and_sparse_stays_coarse(spark):
    out = adaptive_cells(_pts(spark, _clustered()), max_per_cell=25,
                         base_level=3, max_level=18).collect()
    assert len(out) == 450
    counts = {}
    for r in out:
        counts[r["cell"]] = counts.get(r["cell"], 0) + 1
    assert max(counts.values()) <= 25
    levels = {r["pid"]: r["cell_level"] for r in out}
    # the dense cluster needed deeper levels; sparse points stayed coarse
    assert max(levels[i] for i in range(400)) > 3
    assert min(levels[i] for i in range(400, 450)) == 3


def test_cell_contains_its_point_and_levels_match(spark):
    out = adaptive_cells(_pts(spark, _clustered()), max_per_cell=25,
                         base_level=3, max_level=18).collect()
    cells = np.array([r["cell"] for r in out], np.int64)
    assert np.array_equal(C.cell_level(cells),
                          np.array([r["cell_level"] for r in out]))
    x0, y0, x1, y1 = C.cell_bounds(cells)
    lon = np.array([r["lon"] for r in out])
    lat = np.array([r["lat"] for r in out])
    assert np.all((lon >= x0) & (lon < x1) & (lat >= y0) & (lat < y1))
    # prefix compatibility: every cell's ancestor at base level equals
    # the base-level key of the point itself
    anc = C.parent(cells, 3)
    assert np.array_equal(anc, C.cell_of(lon, lat, 3))


def test_uniform_under_threshold_single_round(spark):
    rng = np.random.default_rng(5)
    pts = [tuple(p) for p in rng.uniform([-80, -40], [80, 40],
                                         size=(64, 2))]
    out = adaptive_cells(_pts(spark, pts), max_per_cell=1000,
                         base_level=4).collect()
    assert all(r["cell_level"] == 4 for r in out)


def test_coincident_heap_stops_at_max_level(spark):
    # lone point at (-120, -60): a DIFFERENT level-2 cell than the heap
    # (level-2 cells are 90 x 45 degrees)
    pts = [(10.5, 20.5)] * 40 + [(-120.0, -60.0)]
    out = adaptive_cells(_pts(spark, pts), max_per_cell=10,
                         base_level=2, max_level=6).collect()
    heap = [r for r in out if r["lon"] == 10.5]
    assert all(r["cell_level"] == 6 for r in heap)
    assert len({r["cell"] for r in heap}) == 1  # irreducible, documented
    lone = [r for r in out if r["lon"] == -120.0][0]
    assert lone["cell_level"] == 2


def test_partitioning_invariance(spark):
    pts = _pts(spark, _clustered(seed=9))
    a = sorted(map(tuple, adaptive_cells(
        pts, max_per_cell=25, base_level=3).collect()))
    b = sorted(map(tuple, adaptive_cells(
        pts.repartition(13), max_per_cell=25, base_level=3).collect()))
    assert a == b


def test_param_validation(spark):
    with pytest.raises(ValueError):
        adaptive_cells(_pts(spark, [(0, 0)]), max_per_cell=0)
    with pytest.raises(ValueError):
        adaptive_cells(_pts(spark, [(0, 0)]), max_per_cell=5,
                       base_level=9, max_level=5)
