"""MVT 2.1 codec (sources/mvt.py) + render_mvt_tiles (operators/tiles.py):
spec golden command-stream vectors, winding normalization, Value oneof
round-trip, full tile round-trip, and Spark render-vs-pyramid parity with
half-pixel coordinate reconstruction."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.tiles import (
    MAX_MERCATOR_LAT, render_mvt_tiles, tile_bounds, tile_pyramid)
from spandex_spark.sources import mvt


# ------------------------------------------------------------ wire
def test_varint_zigzag_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1]:
        got, pos = mvt._read_varint(mvt._varint(n), 0)
        assert got == n and pos == len(mvt._varint(n))
    for s in [0, -1, 1, -64, 63, -(2**31), 2**31 - 1]:
        assert mvt._unzigzag(mvt._zigzag(s)) == s
    # spec §4.3.2 zigzag examples
    assert mvt._zigzag(0) == 0
    assert mvt._zigzag(-1) == 1
    assert mvt._zigzag(1) == 2
    assert mvt._zigzag(-2) == 3


def test_spec_golden_command_streams():
    # spec §4.3.5.1: point at (25, 17) -> [9, 50, 34]
    assert mvt._encode_geometry(mvt.POINT, [[(25, 17)]]) == [9, 50, 34]
    # spec §4.3.5.2 multipoint (5,7),(3,2) -> [17, 10, 14, 3, 9]
    assert (mvt._encode_geometry(mvt.POINT, [[(5, 7), (3, 2)]])
            == [17, 10, 14, 3, 9])
    # spec §4.3.5.3 linestring (2,2)->(2,10)->(10,10)
    # MoveTo(+2,+2) LineTo(+0,+8)(+8,+0) = [9 4 4 18 0 16 16 0]
    assert (mvt._encode_geometry(mvt.LINESTRING, [[(2, 2), (2, 10), (10, 10)]])
            == [9, 4, 4, 18, 0, 16, 16, 0])
    # spec §4.3.5.5 polygon (3,6)(8,12)(20,34) closed:
    # [9 6 12 18 10 12 24 44 15]
    assert (mvt._encode_geometry(mvt.POLYGON, [[(3, 6), (8, 12), (20, 34)]])
            == [9, 6, 12, 18, 10, 12, 24, 44, 15])


def test_geometry_decode_inverse():
    for gtype, parts in [
        (mvt.POINT, [[(0, 0), (4095, 4095), (7, 9)]]),
        (mvt.LINESTRING, [[(2, 2), (2, 10)], [(1, 1), (3, 5), (5, 1)]]),
        (mvt.POLYGON, [[(3, 6), (8, 12), (20, 34)]]),
    ]:
        cmds = mvt._encode_geometry(gtype, [list(p) for p in parts])
        assert mvt._decode_geometry(gtype, cmds) == [list(p) for p in parts]


def test_polygon_winding_normalized():
    # CCW-in-screen-coords exterior input (negative y-down shoelace)
    # must come back reversed to positive area; a hole given positive
    # must come back negative (spec §4.3.4.4)
    ext_ccw = [(0, 0), (0, 10), (10, 10), (10, 0)]       # area2 < 0 y-down
    hole_cw = [(2, 2), (8, 2), (8, 8), (2, 8)]           # area2 > 0 y-down
    cmds = mvt._encode_geometry(mvt.POLYGON, [ext_ccw, hole_cw])
    rings = mvt._decode_geometry(mvt.POLYGON, cmds)
    assert mvt._ring_area2(rings[0]) > 0
    assert mvt._ring_area2(rings[1]) < 0
    # same vertex sets, orientation aside
    assert set(rings[0]) == set(ext_ccw) and set(rings[1]) == set(hole_cw)


def test_closed_ring_input_accepted():
    ring = [(0, 0), (10, 0), (10, 10), (0, 0)]  # explicitly closed
    cmds = mvt._encode_geometry(mvt.POLYGON, [ring])
    (out,) = mvt._decode_geometry(mvt.POLYGON, cmds)
    assert len(out) == 3                         # ClosePath implies the 4th


# ------------------------------------------------------------ values/tile
def test_value_oneof_roundtrip():
    blob = mvt.encode_tile([("l", [{
        "id": 7, "type": mvt.POINT, "parts": [[(1, 2)]],
        "props": {"s": "héllo", "i": -12345, "u": 2**40, "f": 2.5,
                  "b": True, "b2": False}}])])
    (layer,) = mvt.decode_tile(blob)
    assert layer["version"] == 2 and layer["extent"] == 4096
    f = layer["features"][0]
    assert f["id"] == 7 and f["parts"] == [[(1, 2)]]
    assert f["props"] == {"s": "héllo", "i": -12345, "u": 2**40,
                          "f": 2.5, "b": True, "b2": False}


def test_tile_roundtrip_multilayer_interning():
    feats_a = [{"id": i, "type": mvt.POINT, "parts": [[(i, i * 2)]],
                "props": {"kind": "poi", "rank": i % 3}} for i in range(20)]
    feats_b = [{"id": 1, "type": mvt.LINESTRING,
                "parts": [[(0, 0), (100, 100), (200, 0)]],
                "props": {"name": "road"}}]
    blob = mvt.encode_tile([("a", feats_a), ("b", feats_b)], extent=512)
    la, lb = mvt.decode_tile(blob)
    assert la["name"] == "a" and lb["name"] == "b"
    assert la["extent"] == 512
    assert [f["parts"] for f in la["features"]] == [f["parts"] for f in feats_a]
    assert [f["props"] for f in la["features"]] == [f["props"] for f in feats_a]
    assert lb["features"][0]["parts"] == feats_b[0]["parts"]
    # interning: 20 features share 2 keys and 1+3 values in the wire dicts
    # (indirectly: blob stays small)
    assert len(blob) < 20 * 40


def test_unsupported_prop_type_raises():
    with pytest.raises(TypeError):
        mvt._encode_value([1, 2])


# ------------------------------------------------------------ spark
@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(23)
    n = 2000
    lon = rng.uniform(-170.0, 170.0, n)
    lat = rng.uniform(-80.0, 80.0, n)
    rows = [(int(i), float(lon[i]), float(lat[i]),
             ["news", "blog", "docs"][i % 3]) for i in range(n)]
    return (spark.createDataFrame(
        rows, "id long, lon double, lat double, kind string"), lon, lat)


def test_render_matches_pyramid_counts(spark, pts):
    df, lon, lat = pts
    z = 4
    tiles = render_mvt_tiles(df, zoom=z, id_col="id",
                             prop_cols=("kind",)).collect()
    pyr = {(r["x"], r["y"]): r["n"]
           for r in tile_pyramid(df, min_zoom=z, max_zoom=z).collect()}
    got = {(r["x"], r["y"]): r["n_features"] for r in tiles}
    assert got == pyr
    assert sum(got.values()) == len(lon)


def test_render_halfpixel_reconstruction(spark, pts):
    df, lon, lat = pts
    z, extent = 6, 4096
    rows = render_mvt_tiles(df, zoom=z, id_col="id",
                            extent=extent).collect()
    n = 1 << z
    by_id = {}
    for r in rows:
        (layer,) = mvt.decode_tile(bytes(r["mvt"]))
        assert layer["extent"] == extent
        for f in layer["features"]:
            ((px, py),) = f["parts"][0]
            assert 0 <= px < extent and 0 <= py < extent
            # tile+pixel -> lon/lat (inverse slippy at subpixel res)
            gx = (r["x"] * extent + px + 0.5) / (n * extent)
            glon = gx * 360.0 - 180.0
            gy = (r["y"] * extent + py + 0.5) / (n * extent)
            glat = math.degrees(
                2.0 * math.atan(math.exp(math.pi * (1 - 2 * gy)))
                - math.pi / 2)
            by_id[f["id"]] = (glon, glat)
    assert len(by_id) == len(lon)
    # half a pixel of a z6 tile: 360 / (64*4096) deg lon
    tol_lon = 360.0 / (n * extent)
    for i in range(len(lon)):
        glon, glat = by_id[i]
        assert abs(glon - lon[i]) <= tol_lon
        # Mercator y tolerance varies with latitude; 1 pixel is ~tol_lon
        # degrees at the equator, stretched by cos(lat) poleward
        assert abs(glat - lat[i]) <= tol_lon / max(
            0.05, math.cos(math.radians(lat[i])))


def test_render_null_coords_dropped_and_null_props_omitted(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0, "a"), (2, None, 5.0, "b"), (3, 20.0, 20.0, None)],
        "id long, lon double, lat double, kind string")
    rows = render_mvt_tiles(df, zoom=2, id_col="id",
                            prop_cols=("kind",)).collect()
    feats = {}
    for r in rows:
        (layer,) = mvt.decode_tile(bytes(r["mvt"]))
        for f in layer["features"]:
            feats[f["id"]] = f["props"]
    assert set(feats) == {1, 3}
    assert feats[1] == {"kind": "a"}
    assert feats[3] == {}
