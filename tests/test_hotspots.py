"""Emerging hot spot analysis (operators/hotspots.py): full numpy
reference parity (binning, zero-fill, per-slice grid Gi*, tie-corrected
Mann-Kendall), the intensifying-hot closed form, constant-field null
result, zero-fill behaviour, and validation."""

import math

import numpy as np
import pytest

from spandex_spark.operators.hotspots import emerging_hotspots

Z95 = 1.9599639845


def _np_emerging(events, cell_size, r=1):
    """(cell_x, cell_y) -> (mean_gi, mk_s, mk_z, trend) reference."""
    from collections import defaultdict
    binned = defaultdict(float)
    for lon, lat, t in events:
        binned[(math.floor(lon / cell_size),
                math.floor(lat / cell_size), t)] += 1.0
    cells = sorted({(x, y) for x, y, _ in binned})
    slices = sorted({t for _, _, t in binned})
    z = {}
    for t in slices:
        v = {c: binned.get((c[0], c[1], t), 0.0) for c in cells}
        n = len(cells)
        xbar = sum(v.values()) / n
        s = math.sqrt(sum(x * x for x in v.values()) / n - xbar * xbar)
        for c in cells:
            nb = [v[(c[0] + dx, c[1] + dy)]
                  for dx in range(-r, r + 1) for dy in range(-r, r + 1)
                  if (c[0] + dx, c[1] + dy) in v]
            wi, wx = len(nb), sum(nb)
            den = (n * wi - wi * wi) / (n - 1) if n > 1 else 0.0
            z[(c, t)] = ((wx - xbar * wi) / (s * math.sqrt(den))
                         if den > 0 and s > 0 else 0.0)
    out = {}
    for c in cells:
        zs = [z[(c, t)] for t in slices]
        n = len(zs)
        S = sum(np.sign(zs[j] - zs[i])
                for i in range(n) for j in range(i + 1, n))
        from collections import Counter
        tie = sum(tg * (tg - 1) * (2 * tg + 5)
                  for tg in Counter(zs).values())
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        if var <= 0:
            mkz = 0.0
        elif S > 0:
            mkz = (S - 1) / math.sqrt(var)
        elif S < 0:
            mkz = (S + 1) / math.sqrt(var)
        else:
            mkz = 0.0
        out[c] = (float(np.mean(zs)), float(S), mkz)
    return out


def _events_growing_center():
    """9x9 cell grid (cell_size=1) with a deterministically-jittered
    background and a 3x3 hot REGION around (4,4) growing +2 events per
    slice.  Growth is kept modest relative to the background variance
    on purpose: Gi* is scale-free, so a lone dominant spike
    standardizes its own growth away (z saturates, MK sees ties) — a
    real intensifying hot spot grows WITHIN a varying field."""
    ev = []
    for t in range(8):
        for cx in range(9):
            for cy in range(9):
                base = 3 + (cx * 5 + cy * 11 + 3 * t * (cx + 2 * cy)) % 9
                if 3 <= cx <= 5 and 3 <= cy <= 5:
                    base += 2 * t
                ev += [(cx + 0.5, cy + 0.5, t)] * base
    return ev


def _run(spark, events, **kw):
    df = spark.createDataFrame(events, "lon double, lat double, t long")
    return {(r.cell_x, r.cell_y): r for r in
            emerging_hotspots(df, cell_size=1.0, slice_col="t",
                              **kw).collect()}


def test_numpy_reference_parity(spark):
    ev = _events_growing_center()
    # sprinkle some asymmetry so the field isn't degenerate
    ev += [(0.5, 0.5, t) for t in range(0, 8, 2)]
    ev += [(4.5, 1.5, 7)] * 5
    ev += [(8.5, 0.5, 3)] * 2
    got = _run(spark, ev)
    exp = _np_emerging(ev, 1.0)
    assert set(got) == set(exp)
    for c in exp:
        assert got[c].mean_gi == pytest.approx(exp[c][0], abs=1e-9)
        assert got[c].mk_s == pytest.approx(exp[c][1], abs=1e-9)
        assert got[c].mk_z == pytest.approx(exp[c][2], abs=1e-9)


def test_growing_center_is_intensifying_hot(spark):
    got = _run(spark, _events_growing_center())
    center = got[(4, 4)]
    assert center.trend == "increasing"
    assert center.mean_gi > Z95
    assert center.category == "intensifying hot"
    corner = got[(8, 8)]
    assert corner.mean_gi < 0            # cold-ish corner, far from center


def test_constant_field_no_pattern(spark):
    ev = [(cx + 0.5, cy + 0.5, t)
          for cx in range(3) for cy in range(3) for t in range(5)]
    got = _run(spark, ev)
    for c, r in got.items():
        assert r.trend == "none"
        assert r.category in ("no pattern",)


def test_zero_fill_extends_sparse_cells(spark):
    # a cell seen only in slice 0 must still have a full z series
    # (zeros elsewhere) — the numpy reference zero-fills too, so
    # parity on this fixture IS the zero-fill check
    ev = ([(x + 0.5, 0.5, t) for x in range(3) for t in range(4)]
          + [(2.5, 0.5, 0)] * 9)
    got = _run(spark, ev)
    exp = _np_emerging(ev, 1.0)
    assert set(got) == set(exp)          # all three cells present
    for c in exp:
        assert got[c].mk_s == pytest.approx(exp[c][1], abs=1e-9)
    assert got[(2, 0)].mk_s < 0          # spike at t=0 then zeros: downward


def test_validation(spark):
    df = spark.createDataFrame([(0.0, 0.0, 0)],
                               "lon double, lat double, t long")
    with pytest.raises(ValueError):
        emerging_hotspots(df, cell_size=0.0, slice_col="t")
    with pytest.raises(ValueError):
        emerging_hotspots(df, cell_size=1.0, slice_col="t",
                          radius_cells=0)
    with pytest.raises(ValueError):
        emerging_hotspots(df, cell_size=1.0, slice_col="t", alpha=2.0)


def test_single_slice_returns_cells_with_no_trend(spark):
    ev = [(cx + 0.5, 0.5, 0) for cx in range(4) for _ in range(cx + 1)]
    got = _run(spark, ev)
    assert len(got) == 4                    # one row per occupied cell
    for r in got.values():
        assert r.mk_s == 0.0 and r.mk_z == 0.0 and r.trend == "none"
