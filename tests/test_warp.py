"""warp_tiles (operators/warp.py): independent-math nearest-neighbor
parity to EPSG:3857, off-raster NULLs, edge-tile shapes."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from spandex_spark.operators.warp import warp_tiles


def _src_tiles(spark):
    """4 tiles of 20x20 px at res 0.1 deg covering [0,4)x[0,2) deg;
    value = row-major global pixel index (exact in float64)."""
    rows = []
    tid = 0
    for ty in range(1):
        for tx in range(2):
            vals = []
            for r in range(20):
                for c in range(20):
                    gx, gy = tx * 20 + c, ty * 20 + r
                    vals.append(float(gy * 40 + gx))
            rows.append(Row(tile_id=tid, x0=float(tx * 2.0),
                            y0=float(ty * 2.0), res=0.1, nx=20, ny=20,
                            values=vals))
            tid += 1
    return spark.createDataFrame(rows)


def test_warp_to_webmercator_nearest_parity(spark):
    src = _src_tiles(spark)
    R = 6_378_137.0   # EPSG:3857 sphere (geom.webmercator_to_lonlat)
    # output grid: 60x30 px of 10 km — extends past the source raster
    out = warp_tiles(src, from_srid_of_output=3857, x0_out=0.0,
                     y0_out=0.0, res_out=10000.0, nx_out=60, ny_out=30,
                     origin_x=0.0, origin_y=0.0, tile_px=25).collect()
    assert sum(r["nx"] * r["ny"] for r in out) == 60 * 30
    got = np.full((30, 60), np.nan)
    for t in out:
        v = np.array([np.nan if x is None else x for x in t["values"]])
        gx0 = int(round(t["x0"] / 10000.0 / 25)) * 25
        gy0 = int(round(t["y0"] / 10000.0 / 25)) * 25
        got[gy0:gy0 + t["ny"], gx0:gx0 + t["nx"]] = \
            v.reshape(t["ny"], t["nx"])
    checked_valid = checked_null = 0
    for gy in range(30):
        for gx in range(60):
            x = (gx + 0.5) * 10000.0
            y = (gy + 0.5) * 10000.0
            lon = math.degrees(x / R)
            lat = math.degrees(2 * math.atan(math.exp(y / R))
                               - math.pi / 2)
            c = math.floor(lon / 0.1)
            r = math.floor(lat / 0.1)
            if 0 <= c < 40 and 0 <= r < 20:
                assert got[gy, gx] == r * 40 + c, (gx, gy)
                checked_valid += 1
            else:
                assert np.isnan(got[gy, gx]), (gx, gy)
                checked_null += 1
    assert checked_valid > 200 and checked_null > 200


def test_edge_tiles_have_partial_shapes(spark):
    src = _src_tiles(spark)
    out = warp_tiles(src, from_srid_of_output=3857, x0_out=0.0,
                     y0_out=0.0, res_out=10000.0, nx_out=33, ny_out=17,
                     origin_x=0.0, origin_y=0.0, tile_px=10).collect()
    shapes = {(r["nx"], r["ny"]) for r in out}
    assert (10, 10) in shapes and (3, 7) in shapes
    for r in out:
        assert len(r["values"]) == r["nx"] * r["ny"]
