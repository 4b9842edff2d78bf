"""DBSCAN (operators/cluster.py::dbscan): hand-worked closed-form
cases plus a brute-force reference implementation (same deterministic
border rule) on a seeded random field."""

import numpy as np
import pytest

from spandex_spark.operators.cluster import dbscan


def _run(spark, pts, eps, min_pts, **kw):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, lon double, lat double")
    rows = dbscan(df, eps=eps, min_pts=min_pts, point_id_col="pid",
                  metric="planar", **kw).collect()
    return ({r["pid"]: r["cluster_id"] for r in rows},
            {r["pid"]: r["is_core"] for r in rows})


def _reference(pts, eps, min_pts):
    """Exact DBSCAN with the documented deterministic border rule."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    d = np.hypot(pts[:, 0, None] - pts[None, :, 0],
                 pts[:, 1, None] - pts[None, :, 1])
    nbr = d <= eps
    core = nbr.sum(axis=1) >= min_pts  # includes self (d=0)
    # components over core-core edges via label propagation to min id
    lab = {i: i for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in lab:
            for j in np.flatnonzero(nbr[i] & core):
                if lab[j] < lab[i]:
                    lab[i] = lab[j]
                    changed = True
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = lab[i]
        else:
            cn = [lab[j] for j in np.flatnonzero(nbr[i] & core) if j != i]
            out[i] = min(cn) if cn else None
    return out, {i: bool(core[i]) for i in range(n)}


def test_hand_worked_core_border_noise(spark):
    # chain A: 0-1-2 spaced 1 apart; point 3 hangs 1 off point 2 but has
    # only 2 neighbours => border; point 4 isolated => noise
    pts = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (50.0, 50.0)]
    cid, core = _run(spark, pts, eps=1.0, min_pts=3)
    assert core == {0: False, 1: True, 2: True, 3: False, 4: False}
    assert cid[1] == cid[2] == 1
    assert cid[0] == 1 and cid[3] == 1  # borders of the same cluster
    assert cid[4] is None


def test_border_takes_min_cluster(spark):
    # two 4-point clumps; the bridge (id 8) reaches exactly one core of
    # each clump and has only 3 neighbours incl itself => border of both
    pts = [(0.0, 0.0), (0.0, 0.1), (-0.1, 0.0), (0.1, 0.0),   # clump A
           (2.0, 0.0), (2.0, 0.1), (2.1, 0.0), (1.9, 0.0),    # clump B
           (1.0, 0.0)]                                         # bridge
    cid, core = _run(spark, pts, eps=0.95, min_pts=4)
    assert all(core[i] for i in range(8)) and not core[8]
    assert cid[0] == cid[3] == 0 and cid[4] == cid[7] == 4
    assert cid[8] == 0  # deterministic: min cluster id of its cores


def test_min_pts_one_every_point_core(spark):
    pts = [(0.0, 0.0), (10.0, 0.0)]
    cid, core = _run(spark, pts, eps=1.0, min_pts=1)
    assert core == {0: True, 1: True}
    assert cid == {0: 0, 1: 1}  # two singleton clusters


def test_matches_reference_on_random_field(spark):
    rng = np.random.default_rng(7)
    blob1 = rng.normal((0, 0), 0.3, (40, 2))
    blob2 = rng.normal((5, 5), 0.3, (40, 2))
    noise = rng.uniform(-8, 12, (30, 2))
    pts = [tuple(p) for p in np.vstack([blob1, blob2, noise])]
    for eps, mp in ((0.5, 4), (0.8, 6), (1.5, 3)):
        got_cid, got_core = _run(spark, pts, eps=eps, min_pts=mp)
        want_cid, want_core = _reference(pts, eps, mp)
        assert got_core == want_core, (eps, mp)
        assert got_cid == want_cid, (eps, mp)


def test_haversine_metric(spark):
    # ~111 km per degree at the equator: eps 150 km links 1-deg spacing
    pts = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (9.0, 0.0)]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, lon double, lat double")
    rows = {r["pid"]: r for r in dbscan(
        df, eps=150_000.0, min_pts=2, point_id_col="pid").collect()}
    assert rows[0]["cluster_id"] == rows[1]["cluster_id"] == rows[2]["cluster_id"] == 0
    assert rows[3]["cluster_id"] is None and not rows[3]["is_core"]
