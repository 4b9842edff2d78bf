"""ST_Subdivide analog (operators/subdivide.py): area preservation,
cell alignment/co-location, holes, full-cell fast path, tag parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark import cells as C
from spandex_spark import geom as G
from spandex_spark.operators.subdivide import subdivide

GEOM_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _poly(pid, xs, ys, offsets=None):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    offsets = offsets or [0, len(xs)]
    return (pid, {"kind": 3, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in offsets],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _rect(pid, x0, y0, x1, y1):
    return _poly(pid, [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])


def _area_of(row):
    return G.rings_area(np.array(row["piece"]["xs"]),
                        np.array(row["piece"]["ys"]),
                        np.array(row["piece"]["ring_offsets"]))


def test_rect_area_preserved_and_cells_disjoint(spark):
    # 1.3 x 0.7 deg rectangle at level 9 (squares ~0.703 deg)
    df = spark.createDataFrame([_rect(1, 0.1, 0.1, 1.4, 0.8)], GEOM_SCHEMA)
    pieces = subdivide(df, level=9).collect()
    assert len(pieces) >= 2
    total = sum(_area_of(r) for r in pieces)
    assert total == pytest.approx(1.3 * 0.7, abs=1e-9)
    # each piece lies inside its own cell square
    for r in pieces:
        lon0, lat0, lon1, lat1 = (float(v[0]) for v in
                                  C.cell_bounds(np.array([r["piece_cell"]])))
        assert min(r["piece"]["xs"]) >= lon0 - 1e-9
        assert max(r["piece"]["xs"]) <= lon1 + 1e-9
        assert min(r["piece"]["ys"]) >= lat0 - 1e-9
        assert max(r["piece"]["ys"]) <= lat1 + 1e-9
    assert len({r["piece_cell"] for r in pieces}) == len(pieces)


def test_holes_survive_subdivision(spark):
    # 4x4 square with a 2x2 hole (outer CCW, hole CW per the repo's
    # geometry convention), subdivided fine: hole area is gone
    xs = [0, 4, 4, 0, 0, 1, 1, 3, 3, 1]
    ys = [0, 0, 4, 4, 0, 1, 3, 3, 1, 1]
    df = spark.createDataFrame([_poly(7, xs, ys, [0, 5, 10])], GEOM_SCHEMA)
    pieces = subdivide(df, level=8).collect()  # ~1.4 deg cells
    total = sum(_area_of(r) for r in pieces)
    assert total == pytest.approx(16.0 - 4.0, abs=1e-8)
    # cells entirely inside the hole emit no piece
    for r in pieces:
        assert _area_of(r) > 0


def test_full_cells_are_exact_rects(spark):
    # a 12x12 polygon at level 9 has guaranteed interior cells; cells are
    # 2:1 (lon 360/2^L x lat 180/2^L)
    df = spark.createDataFrame([_rect(1, -6, -6, 6, 6)], GEOM_SCHEMA)
    pieces = subdivide(df, level=9).collect()
    cell_area = (360.0 / (1 << 9)) * (180.0 / (1 << 9))
    full = [r for r in pieces
            if len(r["piece"]["xs"]) == 5
            and _area_of(r) == pytest.approx(cell_area, rel=1e-12)]
    assert len(full) >= 4  # interior cell rects present and untouched
    total = sum(_area_of(r) for r in pieces)
    assert total == pytest.approx(144.0, abs=1e-7)


def test_auto_level_piece_count(spark):
    df = spark.createDataFrame([_rect(1, 0, 0, 1, 1)], GEOM_SCHEMA)
    n = subdivide(df, target_cells=16.0).count()
    assert 4 <= n <= 64  # ~16 pieces, shape-dependent


def test_tag_parity_with_pieces(spark):
    """Points tagged against subdivided pieces (exact cell equi-join +
    PIP on the piece) match points_in_rings against the original."""
    rng = np.random.default_rng(3)
    px = rng.uniform(-0.5, 2.0, 400)
    py = rng.uniform(-0.5, 2.0, 400)
    xs = np.array([0.0, 1.5, 1.5, 0.7, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 1.2, 1.5, 1.0, 0.0])
    want = G.points_in_rings(px, py, xs, ys, None)

    df = spark.createDataFrame([_poly(1, xs.tolist(), ys.tolist())],
                               GEOM_SCHEMA)
    pieces = subdivide(df, level=9).collect()
    lvl = int(C.cell_level(np.array([pieces[0]["piece_cell"]]))[0])
    pcell = C.cell_of(px, py, lvl)
    got = np.zeros(px.shape[0], dtype=bool)
    by_cell = {r["piece_cell"]: r for r in pieces}
    for i in range(px.shape[0]):
        r = by_cell.get(int(pcell[i]))
        if r is None:
            continue
        got[i] = bool(G.points_in_rings(
            px[i:i+1], py[i:i+1],
            np.array(r["piece"]["xs"]), np.array(r["piece"]["ys"]),
            np.array(r["piece"]["ring_offsets"]))[0])
    # boundary-rule divergence only ON piece seams: compare off-seam points
    cell_w = 360.0 / (1 << lvl)
    on_seam = (np.abs(px / cell_w - np.round(px / cell_w)) < 1e-9) | \
              (np.abs(py / cell_w - np.round(py / cell_w)) < 1e-9)
    assert (got[~on_seam] == want[~on_seam]).all()


def test_null_and_degenerate_geometry_drop(spark):
    rows = [(1, None), _rect(2, 0, 0, 0.5, 0.5)]
    df = spark.createDataFrame(rows, GEOM_SCHEMA)
    out = subdivide(df, level=9).collect()
    assert {r["pid"] for r in out} == {2}


def test_original_columns_and_seq_preserved(spark):
    df = spark.createDataFrame(
        [_rect(5, 0, 0, 2, 2)], GEOM_SCHEMA).withColumn("tag", F.lit("z"))
    out = subdivide(df, level=9).collect()
    seqs = sorted(r["piece_seq"] for r in out)
    assert seqs == list(range(len(out)))
    assert all(r["tag"] == "z" and r["pid"] == 5 for r in out)
