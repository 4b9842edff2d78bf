"""Cost distance (operators/costdist.py): heapq-Dijkstra parity,
tiling invariance (1 tile vs 2x2 vs 4x4 byte-identical), barrier
detours, no-source and unreachable conventions."""

import heapq
import math

import numpy as np
import pytest
from pyspark.sql import Row

from spandex_spark.operators.costdist import cost_distance

ORIGIN = (0.0, 0.0)
RES = 1.0


def _tiles_df(spark, arr, tiles_x, tiles_y):
    """Split a full (H, W) array (row 0 = bottom) into a tile table."""
    H, W = arr.shape
    ny, nx = H // tiles_y, W // tiles_x
    rows = []
    tid = 0
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            sub = arr[ty * ny:(ty + 1) * ny, tx * nx:(tx + 1) * nx]
            vals = [None if np.isnan(v) else float(v)
                    for v in sub.ravel()]
            rows.append(Row(tile_id=tid, x0=float(tx * nx * RES),
                            y0=float(ty * ny * RES), res=RES,
                            nx=nx, ny=ny, values=vals))
            tid += 1
    return spark.createDataFrame(rows)


def _pts_df(spark, pts):
    return spark.createDataFrame([(float(x), float(y)) for x, y in pts],
                                 "lon double, lat double")


def _dijkstra(cost, seeds):
    """Reference 8-connected Dijkstra; cost (H, W), NaN = barrier."""
    H, W = cost.shape
    dist = np.full((H, W), np.inf)
    pq = []
    for (r, c) in seeds:
        if not np.isnan(cost[r, c]):
            dist[r, c] = 0.0
            heapq.heappush(pq, (0.0, r, c))
    diag = math.hypot(RES, RES)
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                r2, c2 = r + dr, c + dc
                if not (0 <= r2 < H and 0 <= c2 < W):
                    continue
                if np.isnan(cost[r2, c2]):
                    continue
                step = diag if dr and dc else RES
                nd = d + (cost[r, c] + cost[r2, c2]) / 2.0 * step
                if nd < dist[r2, c2]:
                    dist[r2, c2] = nd
                    heapq.heappush(pq, (nd, r2, c2))
    return dist


def _collect_full(df, W, H, tiles_x):
    out = np.full((H, W), np.nan)
    for r in df.collect():
        nx, ny = r["nx"], r["ny"]
        tx = int(round(r["x0"] / (nx * RES)))
        ty = int(round(r["y0"] / (ny * RES)))
        v = np.array([np.nan if x is None else x for x in r["values"]])
        out[ty * ny:(ty + 1) * ny, tx * nx:(tx + 1) * nx] = \
            v.reshape(ny, nx)
    return out


@pytest.fixture(scope="module")
def varied_cost():
    rng = np.random.default_rng(13)
    cost = rng.uniform(0.5, 4.0, size=(24, 24))
    cost[6:18, 10] = np.nan          # barrier wall with gaps at ends
    return cost


def test_dijkstra_parity_single_tile(spark, varied_cost):
    tiles = _tiles_df(spark, varied_cost, 1, 1)
    # seed pixel (row 3, col 5): center (5.5, 3.5)
    out = cost_distance(tiles, _pts_df(spark, [(5.5, 3.5)]),
                        origin_x=0.0, origin_y=0.0)
    got = _collect_full(out, 24, 24, 1)
    want = _dijkstra(varied_cost, [(3, 5)])
    want = np.where(np.isinf(want), np.nan, want)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_tiling_invariance(spark, varied_cost):
    pts = _pts_df(spark, [(5.5, 3.5), (20.2, 22.7)])
    ref = None
    for split in (1, 2, 4):
        tiles = _tiles_df(spark, varied_cost, split, split)
        got = _collect_full(
            cost_distance(tiles, pts, origin_x=0.0, origin_y=0.0),
            24, 24, split)
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)


def test_multi_source_takes_min(spark, varied_cost):
    tiles = _tiles_df(spark, varied_cost, 2, 2)
    both = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(1.5, 1.5), (22.5, 22.5)]),
        origin_x=0.0, origin_y=0.0), 24, 24, 2)
    a = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(1.5, 1.5)]),
        origin_x=0.0, origin_y=0.0), 24, 24, 2)
    b = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(22.5, 22.5)]),
        origin_x=0.0, origin_y=0.0), 24, 24, 2)
    np.testing.assert_allclose(both, np.fmin(a, b), rtol=1e-12,
                               equal_nan=True)


def test_barrier_blocks_and_walls_detour(spark):
    cost = np.ones((12, 12))
    cost[:, 6] = np.nan              # full-height wall: right side cut off
    tiles = _tiles_df(spark, cost, 2, 1)
    got = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(2.5, 6.5)]),
        origin_x=0.0, origin_y=0.0), 12, 12, 2)
    assert np.isnan(got[:, 6]).all()          # the wall itself
    assert np.isnan(got[:, 7:]).all()         # unreachable side
    assert np.isfinite(got[:, :6]).all()


def test_no_sources_all_null(spark):
    cost = np.ones((8, 8))
    tiles = _tiles_df(spark, cost, 2, 2)
    got = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(-5.0, -5.0)]),   # off-raster source
        origin_x=0.0, origin_y=0.0), 8, 8, 2)
    assert np.isnan(got).all()


def test_negative_cost_is_barrier(spark):
    cost = np.ones((8, 8))
    cost[3, 3] = -2.0                # invalid cost -> barrier
    tiles = _tiles_df(spark, cost, 1, 1)
    got = _collect_full(cost_distance(
        tiles, _pts_df(spark, [(0.5, 0.5)]),
        origin_x=0.0, origin_y=0.0), 8, 8, 1)
    assert np.isnan(got[3, 3])
    assert np.isfinite(np.delete(got.ravel(), 3 * 8 + 3)).all()
    # reference agrees when the barrier is NaN'd out
    ref = _dijkstra(np.where(cost < 0, np.nan, cost), [(0, 0)])
    np.testing.assert_allclose(
        got, np.where(np.isinf(ref), np.nan, ref), rtol=1e-12,
        equal_nan=True)


def test_isochrones_uniform_cost_rings(spark):
    from spandex_spark.operators.costdist import isochrones
    cost = np.ones((32, 32))
    tiles = _tiles_df(spark, cost, 2, 2)
    iso = isochrones(tiles, _pts_df(spark, [(16.5, 16.5)]),
                     origin_x=0.0, origin_y=0.0, levels=[5.0, 10.0])
    rows = iso.collect()
    assert {r["value"] for r in rows} == {5.0, 10.0}
    for r in rows:
        # every iso vertex sits near the chamfer ring of its level:
        # between the octagon's inradius (level) and ... level*1.083
        # (the 8-connected chamfer metric overestimates euclid by
        # <= sqrt(2)/(1+sqrt(2)/2) ~ 1.0824 on diagonals)
        for x, y in zip(r["xs"], r["ys"]):
            d = math.hypot(x - 16.5, y - 16.5)
            assert r["value"] / 1.09 <= d <= r["value"] + 1.0, (d, r["value"])


def _greedy_descent(dist, start_rc):
    """Reference steepest-descent walk with the SAME tie order."""
    nbrs = ((1, 0), (-1, 0), (0, -1), (0, 1),
            (1, -1), (-1, -1), (1, 1), (-1, 1))
    H, W = dist.shape
    r, c = start_rc
    out = [(r, c, dist[r, c])]
    while dist[r, c] > 0:
        bd, brc = dist[r, c], None
        for dy, dx in nbrs:
            r2, c2 = r + dy, c + dx
            if 0 <= r2 < H and 0 <= c2 < W and not np.isnan(dist[r2, c2]) \
                    and dist[r2, c2] < bd:
                bd, brc = dist[r2, c2], (r2, c2)
        if brc is None:
            break
        r, c = brc
        out.append((r, c, bd))
    return out


def test_cost_path_descends_to_source(spark, varied_cost):
    from spandex_spark.operators.costdist import cost_distance, cost_path
    for split in (1, 3):
        tiles = _tiles_df(spark, varied_cost, split, split)
        dist = cost_distance(tiles, _pts_df(spark, [(5.5, 3.5)]),
                             origin_x=0.0, origin_y=0.0)
        dest = spark.createDataFrame([("d1", 22.5, 21.5)],
                                     "pid string, lon double, lat double")
        rows = sorted(cost_path(dist, dest, origin_x=0.0, origin_y=0.0,
                                dest_id_col="pid").collect(),
                      key=lambda r: r["seq"])
        full = _collect_full(dist, 24, 24, split)
        want = _greedy_descent(full, (21, 22))
        got = [(r["gy"], r["gx"], r["cost"]) for r in rows]
        assert [(g[0], g[1]) for g in got] == \
            [(w[0], w[1]) for w in want], f"split={split}"
        for g, w in zip(got, want):
            assert g[2] == pytest.approx(w[2], rel=1e-12)
        assert rows[-1]["cost"] == 0.0          # reached the source
        assert rows[0]["gx"] == 22 and rows[0]["gy"] == 21
        # strict descent + 8-adjacency
        for a, b in zip(rows, rows[1:]):
            assert b["cost"] < a["cost"]
            assert max(abs(b["gx"] - a["gx"]), abs(b["gy"] - a["gy"])) == 1


def test_cost_path_unreachable_dest_empty(spark):
    from spandex_spark.operators.costdist import cost_distance, cost_path
    cost = np.ones((12, 12))
    cost[:, 6] = np.nan
    tiles = _tiles_df(spark, cost, 2, 1)
    dist = cost_distance(tiles, _pts_df(spark, [(2.5, 6.5)]),
                         origin_x=0.0, origin_y=0.0)
    dest = spark.createDataFrame([("far", 10.5, 6.5)],
                                 "pid string, lon double, lat double")
    assert cost_path(dist, dest, origin_x=0.0, origin_y=0.0,
                     dest_id_col="pid").count() == 0


def test_proximity_chamfer_distance(spark):
    from spandex_spark.operators.costdist import proximity
    vals = np.full((16, 16), np.nan)
    vals[8, 8] = 5.0                    # single target pixel
    tiles = _tiles_df(spark, vals, 2, 2)
    got = _collect_full(proximity(tiles, origin_x=0.0, origin_y=0.0,
                                  target_value=5.0), 16, 16, 2)
    assert got[8, 8] == 0.0
    assert got[8, 10] == pytest.approx(2.0)         # 2 orthogonal steps
    assert got[10, 10] == pytest.approx(2 * math.hypot(1, 1))
    # chamfer vs euclid: knight's-move cell = 1 diag + 1 orth
    assert got[9, 10] == pytest.approx(math.hypot(1, 1) + 1.0)
    # default target = all non-NULL
    got2 = _collect_full(proximity(tiles, origin_x=0.0, origin_y=0.0),
                         16, 16, 2)
    np.testing.assert_allclose(got2, got, rtol=1e-12, equal_nan=True)
