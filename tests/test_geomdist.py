"""Hausdorff + discrete Fréchet (operators/geomdist.py): closed forms,
the closing-ring edge case, vertex-vs-segment superiority, densify
tightening, Fréchet orientation sensitivity, NULL contracts."""

import math

import numpy as np
import pytest

from spandex_spark.operators.geomdist import (frechet_distance,
                                              hausdorff_distance)


def _g(kind, parts):
    xs = [float(x) for p in parts for x, _ in p]
    ys = [float(y) for p in parts for _, y in p]
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + len(p))
    return {"kind": kind, "xs": xs, "ys": ys, "ring_offsets": offs,
            "bbox": {"minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)}}


_SCHEMA = ("id long, geom_a struct<kind:tinyint, xs:array<double>, "
           "ys:array<double>, ring_offsets:array<int>, "
           "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>, "
           "geom_b struct<kind:tinyint, xs:array<double>, "
           "ys:array<double>, ring_offsets:array<int>, "
           "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


SQ = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]


def test_hausdorff_translated_squares(spark):
    df = _pairs(spark, [(0, _g(3, [SQ]),
                         _g(3, [[(x + 3, y) for x, y in SQ]]))])
    got = hausdorff_distance(df).collect()[0]["hausdorff"]
    assert abs(got - 3.0) < 1e-12


def test_directed_distance_uses_closing_edge():
    # kernel-level: a short segment left of the unit square projects
    # onto the square's IMPLICIT closing edge (0,1)->(0,0); without
    # ring closing the nearest stored segment would be ~0.58 away
    from spandex_spark.operators.geomdist import _closed_parts, _directed_h
    import numpy as np
    a = _closed_parts(np.array([-0.3, -0.2]), np.array([0.5, 0.5]),
                      [0, 2], 2)
    sq = _closed_parts(np.array([0.0, 1.0, 1.0, 0.0]),
                       np.array([0.0, 0.0, 1.0, 1.0]), [0, 4], 3)
    assert abs(_directed_h(a, sq) - 0.3) < 1e-12
    # sanity: closing appended exactly one vertex per polygon ring
    assert sq[0][0].shape[0] == 5 and sq[0][0][0] == sq[0][0][-1]


def test_hausdorff_vertex_to_segment_exact(spark):
    # A above the MIDDLE of B's long segment: vertex-to-vertex would
    # report hypot(5,2); vertex-to-segment gives the true 2.0 directed
    a = [(5.0, 1.0), (5.0, 2.0)]
    b = [(0.0, 0.0), (10.0, 0.0)]
    df = _pairs(spark, [(0, _g(2, [a]), _g(2, [b]))])
    got = hausdorff_distance(df).collect()[0]["hausdorff"]
    # symmetric: h(B,A) dominates — endpoint (0,0) to segment a
    want = math.hypot(5.0, 1.0)
    assert abs(got - want) < 1e-12


def test_densify_tightens(spark):
    # two long crossing-ish segments where both vertex sets sit close
    # but mid-segment points diverge: densify raises toward the truth
    a = [(0.0, 0.0), (10.0, 0.0)]
    b = [(0.0, 0.1), (5.0, 3.0), (10.0, 0.1)]   # tent over the segment
    df = _pairs(spark, [(0, _g(2, [a]), _g(2, [b]))])
    d1 = hausdorff_distance(df, densify=1).collect()[0]["hausdorff"]
    d8 = hausdorff_distance(df, densify=8).collect()[0]["hausdorff"]
    assert d8 >= d1 - 1e-12
    assert abs(d1 - 3.0) < 1e-12          # tent apex to segment
    assert abs(d8 - 3.0) < 1e-12          # already exact here


def test_hausdorff_null_contract(spark):
    df = _pairs(spark, [(0, None, _g(3, [SQ]))])
    assert hausdorff_distance(df).collect()[0]["hausdorff"] is None


def test_frechet_parallel_vs_reversed(spark):
    a = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0)]
    b = [(0.0, 1.0), (5.0, 1.0), (10.0, 1.0)]
    br = list(reversed(b))
    df = _pairs(spark, [(0, _g(2, [a]), _g(2, [b])),
                        (1, _g(2, [a]), _g(2, [br]))])
    got = {r["id"]: r["frechet"] for r in frechet_distance(df).collect()}
    assert abs(got[0] - 1.0) < 1e-12        # same orientation: offset
    assert abs(got[1] - math.hypot(10, 1)) < 1e-12   # reversed: must span


def test_frechet_at_least_hausdorff(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(5):
        a = [(float(x), float(rng.uniform(0, 3))) for x in range(6)]
        b = [(float(x), float(rng.uniform(0, 3))) for x in range(6)]
        rows.append((i, _g(2, [a]), _g(2, [b])))
    df = _pairs(spark, rows)
    out = frechet_distance(hausdorff_distance(df)).collect()
    for r in out:
        assert r["frechet"] >= r["hausdorff"] - 1e-9


def test_frechet_null_for_polygons_and_multiparts(spark):
    df = _pairs(spark, [
        (0, _g(3, [SQ]), _g(2, [[(0.0, 0.0), (1.0, 1.0)]])),
        (1, _g(2, [[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 3.0)]]),
         _g(2, [[(0.0, 0.0), (1.0, 1.0)]])),
    ])
    got = [r["frechet"] for r in frechet_distance(df).collect()]
    assert got == [None, None]
