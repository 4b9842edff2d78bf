"""Distributed region labeling (operators/regions.py::region_group):
tiling invariance (4-tile == 1-tile byte-identical), cross-seam blob
merging, 4-vs-8 connectivity on diagonals incl. the 4-tile corner,
by_value semantics, nodata passthrough."""

import numpy as np
import pytest

from spandex_spark.operators.regions import region_group

RES = 1.0


def _tiles(spark, arrays, npx):
    rows = []
    for (tx, ty), a in arrays.items():
        vals = [None if np.isnan(v) else float(v) for v in a.ravel()]
        rows.append((ty * 100 + tx, tx * npx * RES, ty * npx * RES,
                     RES, RES, npx, npx, vals))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, res_y double,"
              " nx int, ny int, values array<double>")


def _collect(df, npx):
    out = {}
    for r in df.collect():
        out[r["tile_id"]] = np.asarray(
            [np.nan if v is None else v for v in r["values"]],
            np.float64).reshape(npx, npx)
    return out


def _stitch(tiles, npx, nt):
    full = np.full((nt * npx, nt * npx), np.nan)
    for tid, arr in tiles.items():
        ty, tx = divmod(tid, 100)
        full[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx] = arr
    return full


def test_single_tile_two_blobs(spark):
    a = np.full((4, 4), np.nan)
    a[0, 0:2] = 7.0          # blob A
    a[3, 2:4] = 7.0          # blob B, same value but disconnected
    got = _collect(region_group(_tiles(spark, {(0, 0): a}, 4),
                                origin_x=0, origin_y=0), 4)[0]
    assert got[0, 0] == got[0, 1]
    assert got[3, 2] == got[3, 3]
    assert got[0, 0] != got[3, 2]
    assert np.isnan(got[1, 1])


def test_tiling_invariance_byte_identical(spark):
    npx, rng = 5, np.random.default_rng(4)
    # random small-alphabet field: many regions, many seam merges
    big = rng.integers(0, 3, (2 * npx, 2 * npx)).astype(float)
    quads = {(tx, ty): big[ty*npx:(ty+1)*npx, tx*npx:(tx+1)*npx].copy()
             for tx in range(2) for ty in range(2)}
    tiled = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0), npx), npx, 2)
    single = _collect(region_group(
        _tiles(spark, {(0, 0): big}, 2 * npx), origin_x=0, origin_y=0),
        2 * npx)[0]
    assert np.array_equal(tiled, single, equal_nan=True)


def test_blob_across_seam_is_one_region(spark):
    npx = 3
    a = np.zeros((npx, npx))          # all value 0 -> all one region
    quads = {(tx, ty): a.copy() for tx in range(2) for ty in range(2)}
    got = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0), npx), npx, 2)
    assert np.unique(got).shape[0] == 1


def test_diagonal_connectivity_4_vs_8_at_tile_corner(spark):
    npx = 2
    # one pixel at the NE corner of tile (0,0) and one at the SW corner
    # of tile (1,1): they touch ONLY diagonally, exactly at the 4-tile
    # meeting point
    quads = {(tx, ty): np.full((npx, npx), np.nan)
             for tx in range(2) for ty in range(2)}
    quads[(0, 0)][-1, -1] = 5.0       # row -1 = north, col -1 = east
    quads[(1, 1)][0, 0] = 5.0
    got4 = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0,
        connectivity=4), npx), npx, 2)
    got8 = _stitch(_collect(region_group(
        _tiles(spark, quads, npx), origin_x=0, origin_y=0,
        connectivity=8), npx), npx, 2)
    v4 = got4[~np.isnan(got4)]
    v8 = got8[~np.isnan(got8)]
    assert np.unique(v4).shape[0] == 2        # separate under 4-conn
    assert np.unique(v8).shape[0] == 1        # merged under 8-conn


def test_by_value_false_merges_values(spark):
    npx = 3
    a = np.arange(9, dtype=float).reshape(3, 3)   # all distinct values
    got_v = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                  origin_x=0, origin_y=0,
                                  by_value=True), npx)[0]
    got_m = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                  origin_x=0, origin_y=0,
                                  by_value=False), npx)[0]
    assert np.unique(got_v).shape[0] == 9
    assert np.unique(got_m).shape[0] == 1


def test_labels_are_min_packed_pixel_ids(spark):
    npx = 3
    a = np.zeros((npx, npx))
    got = _collect(region_group(_tiles(spark, {(0, 0): a}, npx),
                                origin_x=0, origin_y=0), npx)[0]
    assert np.all(got == 0.0)    # min pixel (gx=0, gy=0) -> label 0
    with pytest.raises(ValueError):
        region_group(_tiles(spark, {(0, 0): a}, npx),
                     origin_x=0, origin_y=0, connectivity=6)


def test_run_ccl_matches_pixel_bruteforce():
    """The run-length union-find (the 8x-faster local kernel) must match
    a per-pixel reference exactly — every connectivity/by_value combo,
    random nodata, random global offsets."""
    from spandex_spark.operators.regions import _PACK, _local_ccl

    def brute(v, gx0, gy0, conn, by_value):
        ny, nx = v.shape
        valid = ~np.isnan(v)
        parent = {}

        def find(a):
            r = a
            while parent[r] != r:
                r = parent[r]
            while parent[a] != r:
                parent[a], a = r, parent[a]
            return r

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

        def pid(r, c):
            return (gy0 + r) * _PACK + (gx0 + c)

        def same(r1, c1, r2, c2):
            if not (valid[r1, c1] and valid[r2, c2]):
                return False
            return (not by_value) or v[r1, c1] == v[r2, c2]

        for r in range(ny):
            for c in range(nx):
                if not valid[r, c]:
                    continue
                me = pid(r, c)
                parent.setdefault(me, me)
                if c > 0 and same(r, c, r, c - 1):
                    union(me, pid(r, c - 1))
                if r > 0 and same(r, c, r - 1, c):
                    union(me, pid(r - 1, c))
                if conn == 8 and r > 0:
                    if c > 0 and same(r, c, r - 1, c - 1):
                        union(me, pid(r - 1, c - 1))
                    if c < nx - 1 and same(r, c, r - 1, c + 1):
                        union(me, pid(r - 1, c + 1))
        lab = np.full((ny, nx), np.nan)
        for r in range(ny):
            for c in range(nx):
                if valid[r, c]:
                    lab[r, c] = float(find(pid(r, c)))
        return lab

    rng = np.random.default_rng(0)
    for _ in range(120):
        ny, nx = rng.integers(1, 10, 2)
        v = rng.integers(0, 3, (ny, nx)).astype(float)
        v[rng.uniform(0, 1, (ny, nx)) < 0.25] = np.nan
        gx0, gy0 = int(rng.integers(0, 100)), int(rng.integers(0, 100))
        for conn in (4, 8):
            for bv in (True, False):
                a = _local_ccl(v.copy(), gx0, gy0, conn, bv)
                b = brute(v.copy(), gx0, gy0, conn, bv)
                assert np.array_equal(a, b, equal_nan=True), (conn, bv, v)
