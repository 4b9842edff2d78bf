"""Contours (operators/contour.py): ramp closed form incl. seams,
circle-field length sanity, seam == single-tile equivalence, saddle
rule, nodata, and assembly into polylines."""

import numpy as np
import pytest

from spandex_spark.operators.contour import assemble_contours, contour_lines

RES = 0.5


def _tiles(spark, field, nt=2, npx=10):
    """nt x nt tiles of npx x npx pixels, res RES, origin (0,0)."""
    rows = []
    for ty in range(nt):
        for tx in range(nt):
            x0, y0 = tx * npx * RES, ty * npx * RES
            px = x0 + (np.arange(npx) + 0.5) * RES
            py = y0 + (np.arange(npx) + 0.5) * RES
            lon, lat = np.meshgrid(px, py)
            rows.append((ty * nt + tx, x0, y0, RES, RES, npx, npx,
                         field(lon, lat).ravel().tolist()))
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>")


def test_ramp_vertical_line_exact_across_seams(spark):
    """v = x, level 4.9 (tile seam at x=5.0 is between centers 4.75 and
    5.25, so the contour crosses the seam cells): one straight vertical
    line, every segment exactly on x=4.9."""
    tiles = _tiles(spark, lambda x, y: x)
    segs = contour_lines(tiles, levels=[4.9], origin_x=0.0,
                         origin_y=0.0).collect()
    # one segment per horizontal cell row: global 20 rows -> 19 cells
    assert len(segs) == 19
    for s in segs:
        assert s["x1"] == pytest.approx(4.9, abs=1e-12)
        assert s["x2"] == pytest.approx(4.9, abs=1e-12)
        assert abs(s["y2"] - s["y1"]) == pytest.approx(RES, abs=1e-12)
    lines = assemble_contours(contour_lines(
        tiles, levels=[4.9], origin_x=0.0, origin_y=0.0)).collect()
    assert len(lines) == 1
    ln = lines[0]
    assert not ln["closed"]
    assert ln["length"] == pytest.approx(19 * RES, abs=1e-9)


def test_seam_equivalence_single_big_tile(spark):
    field = lambda x, y: np.sin(x * 0.7) + np.cos(y * 0.9)
    four = _tiles(spark, field, nt=2, npx=10)
    one = _tiles(spark, field, nt=1, npx=20)
    a = sorted((round(s["x1"], 9), round(s["y1"], 9),
                round(s["x2"], 9), round(s["y2"], 9))
               for s in contour_lines(four, levels=[0.3], origin_x=0.0,
                                      origin_y=0.0).collect())
    b = sorted((round(s["x1"], 9), round(s["y1"], 9),
                round(s["x2"], 9), round(s["y2"], 9))
               for s in contour_lines(one, levels=[0.3], origin_x=0.0,
                                      origin_y=0.0).collect())
    assert a == b and len(a) > 0


def test_circle_closes_with_right_length(spark):
    """v = -(distance from grid center); level picks radius 3 => one
    closed ring of length ~ 2*pi*3."""
    cx = cy = 5.0
    field = lambda x, y: -np.hypot(x - cx, y - cy)
    lines = assemble_contours(contour_lines(
        _tiles(spark, field), levels=[-3.0], origin_x=0.0,
        origin_y=0.0)).collect()
    assert len(lines) == 1 and lines[0]["closed"]
    assert lines[0]["length"] == pytest.approx(2 * np.pi * 3.0, rel=0.01)
    xs, ys = np.array(lines[0]["xs"]), np.array(lines[0]["ys"])
    r = np.hypot(xs - cx, ys - cy)
    assert np.all(np.abs(r - 3.0) < 0.06)


def test_multiple_levels(spark):
    tiles = _tiles(spark, lambda x, y: x)
    segs = contour_lines(tiles, levels=[2.6, 7.4], origin_x=0.0,
                         origin_y=0.0)
    per = {r["value"]: r["count"]
           for r in segs.groupBy("value").count().collect()}
    assert per == {2.6: 19, 7.4: 19}


def test_nodata_cells_skipped(spark):
    from pyspark.sql import functions as F
    tiles = _tiles(spark, lambda x, y: x, nt=1, npx=10)
    # null the column of pixels at x index 4 (centers x=2.25)
    tiles = tiles.withColumn(
        "values", F.transform("values", lambda v, i:
                              F.when(i % 10 == 4, F.lit(None)).otherwise(v)))
    segs = contour_lines(tiles, levels=[2.1], origin_x=0.0,
                         origin_y=0.0).collect()
    # contour at 2.1 lives between centers 1.75 (idx 3) and 2.25 (idx 4):
    # every such cell touches the NaN column -> nothing emitted
    assert segs == []
    # a contour away from the hole still appears
    far = contour_lines(tiles, levels=[3.6], origin_x=0.0,
                        origin_y=0.0).collect()
    assert len(far) == 9


def test_saddle_rule(spark):
    """2x2 checkerboard: high at ll/ur, low at lr/ul, center average
    above the level => case 5 with center_in=True => L-T and B-R."""
    rows = [(0, 0.0, 0.0, 1.0, 1.0, 2, 2, [1.0, 0.0, 0.0, 1.0])]
    tiles = spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>")
    segs = contour_lines(tiles, levels=[0.4], origin_x=0.0,
                         origin_y=0.0).collect()
    # center avg = 0.5 > 0.4 -> the two inside corners stay connected:
    # two segments
    assert len(segs) == 2
    ends = sorted(sorted([(round(s["x1"], 6), round(s["y1"], 6)),
                          (round(s["x2"], 6), round(s["y2"], 6))])
                  for s in segs)
    # edge crossings at t=0.6/0.4 on each crossing edge
    assert ends[0][0][0] == pytest.approx(0.5)  # touches left or bottom edge


def test_empty_levels_rejected(spark):
    with pytest.raises(ValueError, match="levels"):
        contour_lines(_tiles(spark, lambda x, y: x), levels=[],
                      origin_x=0.0, origin_y=0.0)
