"""ST_GeneratePoints analog (operators/genpoints.py): containment,
determinism under repartitioning, hole exclusion, uniformity."""

import numpy as np
import pytest

from spandex_spark.operators.genpoints import generate_points

GEOM_SCHEMA = ("pid long, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _poly(pid, xs, ys, offsets=None):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    return (pid, {"kind": 3, "xs": xs, "ys": ys,
                  "ring_offsets": [int(v) for v in (offsets or [0, len(xs)])],
                  "bbox": {"minx": min(xs), "miny": min(ys),
                           "maxx": max(xs), "maxy": max(ys)}})


def _df(spark):
    return spark.createDataFrame(
        [_poly(1, [0, 2, 2, 0, 0], [0, 0, 2, 2, 0]),
         # donut with hole [1,3]x[1,3] inside [0,4]x[0,4]
         _poly(2, [0, 4, 4, 0, 0, 1, 1, 3, 3, 1],
               [0, 0, 4, 4, 0, 1, 3, 3, 1, 1], [0, 5, 10]),
         (3, None)], GEOM_SCHEMA)


def test_count_containment_and_null(spark):
    rows = generate_points(_df(spark), n=200, id_col="pid").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["lon"], r["lat"]))
    assert set(by_id) == {1, 2}
    assert len(by_id[1]) == 200 and len(by_id[2]) == 200
    for x, y in by_id[1]:
        assert 0 <= x <= 2 and 0 <= y <= 2
    for x, y in by_id[2]:
        assert 0 <= x <= 4 and 0 <= y <= 4
        assert not (1 < x < 3 and 1 < y < 3)  # hole excluded


def test_deterministic_and_partition_independent(spark):
    df = _df(spark)
    a = sorted(map(tuple, generate_points(df, n=50, id_col="pid").collect()))
    b = sorted(map(tuple, generate_points(
        df.repartition(7, "pid"), n=50, id_col="pid").collect()))
    c = sorted(map(tuple, generate_points(df, n=50, id_col="pid").collect()))
    assert a == b == c
    d = sorted(map(tuple, generate_points(
        df, n=50, id_col="pid", seed=1).collect()))
    assert d != a  # different seed, different draw


def test_uniformity(spark):
    pts = generate_points(_df(spark), n=4000, id_col="pid") \
        .filter("id = 1").collect()
    xs = np.array([r["lon"] for r in pts])
    ys = np.array([r["lat"] for r in pts])
    # mean of U(0,2): 1.0, sd of mean = (2/sqrt(12))/sqrt(4000) ~ 0.009
    assert abs(xs.mean() - 1.0) < 0.05 and abs(ys.mean() - 1.0) < 0.05
    # quadrant balance within 4 sigma
    q = ((xs > 1).astype(int) * 2 + (ys > 1)).astype(int)
    counts = np.bincount(q, minlength=4)
    assert (np.abs(counts - 1000) < 4 * np.sqrt(1000 * 0.75)).all()


def test_bad_n(spark):
    with pytest.raises(ValueError, match="n must be"):
        generate_points(_df(spark), n=0, id_col="pid")
