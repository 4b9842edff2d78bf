"""Raster profile (operators/zonal.py::raster_profile) and CCNet
perplexity buckets (operators/langmodel.py::perplexity_buckets)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.langmodel import perplexity_buckets
from spandex_spark.operators.zonal import raster_profile

TILE = ("tile_id long, x0 double, y0 double, res double, "
        "nx int, ny int, values array<double>")
LINE = ("lid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _gradient_tiles(spark, n=20):
    # v(x, y) = floor(x): one tile, unit pixels
    vals = [float(c) for r in range(n) for c in range(n)]
    return spark.createDataFrame([(1, 0.0, 0.0, 1.0, n, n, vals)], TILE)


def _line(lid, pts, offsets=None):
    xs = [float(p[0]) for p in pts]
    ys = [float(p[1]) for p in pts]
    offsets = offsets or [0, len(xs)]
    return (lid, {"kind": 2, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in offsets],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def test_profile_straight_line_closed_form(spark):
    lines = spark.createDataFrame(
        [_line(1, [(0.5, 5.5), (10.5, 5.5)])], LINE)
    out = sorted(raster_profile(
        lines, _gradient_tiles(spark), line_id_col="lid", step=1.0,
        origin_x=0.0, origin_y=0.0).collect(), key=lambda r: r["s"])
    assert len(out) == 11  # 0..10 by 1, endpoint included
    for r in out:
        assert r["dist"] == pytest.approx(r["s"] * 1.0)
        assert r["lon"] == pytest.approx(0.5 + r["dist"])
        assert r["v"] == float(int(0.5 + r["dist"]))  # floor(x) raster


def test_profile_bent_line_arclength_and_endpoint(spark):
    # L-shaped line of length 4 + 3 = 7, step 2 -> d = 0,2,4,6,7
    lines = spark.createDataFrame(
        [_line(1, [(1.5, 1.5), (5.5, 1.5), (5.5, 4.5)])], LINE)
    out = sorted(raster_profile(
        lines, _gradient_tiles(spark), line_id_col="lid", step=2.0,
        origin_x=0.0, origin_y=0.0).collect(), key=lambda r: r["s"])
    assert [r["dist"] for r in out] == [0.0, 2.0, 4.0, 6.0, 7.0]
    assert out[-1]["lon"] == pytest.approx(5.5)
    assert out[-1]["lat"] == pytest.approx(4.5)
    assert out[3]["lat"] == pytest.approx(3.5)  # 2 up the vertical leg


def test_profile_off_raster_null_and_multipart_empty(spark):
    lines = spark.createDataFrame(
        [_line(1, [(18.5, 5.5), (25.5, 5.5)]),
         _line(2, [(0, 0), (1, 0), (2, 0), (3, 0)], offsets=[0, 2, 4])],
        LINE)
    rows = raster_profile(lines, _gradient_tiles(spark),
                          line_id_col="lid", step=1.0,
                          origin_x=0.0, origin_y=0.0).collect()
    assert {r["lid"] for r in rows} == {1}  # multipart -> no rows
    by_s = {r["s"]: r for r in rows}
    assert by_s[0]["v"] == 18.0
    assert by_s[4]["v"] is None  # off the 20x20 raster


def test_perplexity_buckets_per_language(spark):
    rows = []
    for lang, base in (("en", 10.0), ("fr", 100.0)):
        for i in range(9):
            rows.append((f"{lang}{i}", lang, base + i))
    rows.append(("x", "en", None))
    df = spark.createDataFrame(rows, "doc_id string, lang string,"
                                     " perplexity double")
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(df).collect()}
    for lang in ("en", "fr"):
        assert [out[f"{lang}{i}"] for i in range(9)] == \
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert out["x"] is None
    with pytest.raises(ValueError):
        perplexity_buckets(df, cuts=(0.5,), labels=("a", "b", "c"))


def test_raster_pyramid_levels_and_means(spark):
    from spandex_spark.operators.zonal import raster_pyramid
    # 2x2 tile grid of 4x4 tiles; v = global column index
    rows = []
    n = 4
    for ty in range(2):
        for tx in range(2):
            vals = [float(tx * n + c) for r in range(n) for c in range(n)]
            rows.append((ty * 10 + tx, tx * 4.0, ty * 4.0, 1.0, n, n,
                         vals))
    tiles = spark.createDataFrame(rows, TILE)
    out = raster_pyramid(tiles, levels=2, origin_x=0.0, origin_y=0.0)
    by_level = {}
    for r in out.collect():
        by_level.setdefault(r["level"], []).append(r)
    assert sorted(by_level) == [0, 1, 2]
    assert len(by_level[0]) == 4 and len(by_level[1]) == 1 \
        and len(by_level[2]) == 1
    l1 = by_level[1][0]
    assert (l1["res"], l1["nx"], l1["ny"]) == (2.0, 4, 4)
    assert (l1["x0"], l1["y0"]) == (0.0, 0.0)
    # level-1 pixel (row 0, col c) = mean of global cols 2c, 2c+1
    want = [(2 * c + 0.5) for c in range(4)]
    assert l1["values"][:4] == pytest.approx(want)
    l2 = by_level[2][0]
    assert (l2["res"], l2["nx"], l2["ny"]) == (4.0, 4, 4)
    # level 2 covers 16x16 input pixels with only 8x8 present: the
    # right half (missing tiles) is NULL
    v2 = l2["values"]
    assert all(v is None for i, v in enumerate(v2)
               if i % 4 >= 2 or i // 4 >= 2)
    assert v2[0] == pytest.approx(1.5)  # mean of global cols 0..3


def test_raster_pyramid_nodata_average(spark):
    from spandex_spark.operators.zonal import raster_pyramid
    vals = [1.0, None, None, None] + [None] * 12  # one 2x2 block: only 1.0
    tiles = spark.createDataFrame([(1, 0.0, 0.0, 1.0, 4, 4, vals)], TILE)
    out = raster_pyramid(tiles, levels=1, origin_x=0.0, origin_y=0.0)
    l1 = [r for r in out.collect() if r["level"] == 1][0]
    assert l1["values"][0] == pytest.approx(1.0)  # mean of non-null
    assert l1["values"][1] is None                # all-null block
