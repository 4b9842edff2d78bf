"""Geometry distance metrics — ST_HausdorffDistance and
ST_FrechetDistance analogs.

Reference semantics: PostGIS computes both per geometry pair via GEOS;
spandex-scale pipelines use them for conflation (same road from two
providers?) and for change detection between layer versions. Mirrored
here as per-row Arrow-batched pandas UDFs over two geometry-struct
columns — the caller builds pairs (join/zip) first, so the metric
itself is embarrassingly parallel with no shuffle (the
bounded-feature contract of `operators/bounds.py`).

Hausdorff is the VERTEX-TO-SEGMENT discrete form in both directions:
max over vertices of one geometry of the exact point-to-segment
distance to the other (rings closed first — the engine stores rings
open). That dominates GEOS's vertex-to-vertex discretization and is
exact whenever the true farthest point is a vertex; ``densify`` splits
every segment into k pieces first (GEOS densifyFraction analog) to
tighten the remaining cases.

Fréchet is the discrete (vertex-sequence) form, the standard O(n·m)
dynamic program (Eiter & Mannila 1994), single-part linestrings only —
the metric depends on traversal order, which polygons/multiparts don't
define; such rows return NULL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom


def _closed_parts(xs, ys, offs, kind):
    """(xs, ys) per part, rings closed for polygon kinds."""
    out = []
    for rx, ry in _geom.rings_of(np.asarray(xs, np.float64),
                                 np.asarray(ys, np.float64), offs):
        if kind in (3, 6) and rx.shape[0] >= 2 and (
                rx[0] != rx[-1] or ry[0] != ry[-1]):
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
        out.append((rx, ry))
    return out


def _densify(parts, k):
    """Split every segment of every part into k equal pieces."""
    if k <= 1:
        return parts
    out = []
    for rx, ry in parts:
        if rx.shape[0] < 2:
            out.append((rx, ry))
            continue
        t = np.linspace(0.0, 1.0, k, endpoint=False)
        nx = (rx[:-1, None] + t[None, :] * np.diff(rx)[:, None]).ravel()
        ny = (ry[:-1, None] + t[None, :] * np.diff(ry)[:, None]).ravel()
        out.append((np.append(nx, rx[-1]), np.append(ny, ry[-1])))
    return out


def _directed_h(parts_a, parts_b):
    """max over vertices of A of min point-to-segment distance to B."""
    px = np.concatenate([p[0] for p in parts_a])
    py = np.concatenate([p[1] for p in parts_a])
    best = np.full(px.shape[0], np.inf)
    for rx, ry in parts_b:
        if rx.shape[0] == 1:
            d2 = np.hypot(px - rx[0], py - ry[0])
            np.minimum(best, d2, out=best)
            continue
        d = _geom.points_to_linestring_dist(px, py, rx, ry,
                                            np.array([0, rx.shape[0]]))
        np.minimum(best, d, out=best)
    return float(best.max())


def hausdorff_distance(df: DataFrame, *, geom_a: str = "geom_a",
                       geom_b: str = "geom_b",
                       out_col: str = "hausdorff",
                       densify: int = 1) -> DataFrame:
    """Symmetric vertex-to-segment Hausdorff distance between two
    geometry columns (module docstring). NULL if either side is NULL."""
    if densify < 1:
        raise ValueError("densify must be >= 1")

    @pandas_udf(T.DoubleType())
    def _h(ka: pd.Series, xa: pd.Series, ya: pd.Series, oa: pd.Series,
           kb: pd.Series, xb: pd.Series, yb: pd.Series,
           ob: pd.Series) -> pd.Series:
        out = np.full(len(xa), np.nan)
        for i in range(len(xa)):
            if (ka.iloc[i] is None or pd.isna(ka.iloc[i])
                    or kb.iloc[i] is None or pd.isna(kb.iloc[i])):
                continue
            pa = _closed_parts(xa.iloc[i], ya.iloc[i], oa.iloc[i],
                               int(ka.iloc[i]))
            pb = _closed_parts(xb.iloc[i], yb.iloc[i], ob.iloc[i],
                               int(kb.iloc[i]))
            if not pa or not pb:
                continue
            da = _densify(pa, densify)
            db = _densify(pb, densify)
            out[i] = max(_directed_h(da, pb), _directed_h(db, pa))
        return pd.Series(out)

    a, b = F.col(geom_a), F.col(geom_b)
    return df.withColumn(out_col, _h(
        a["kind"], a["xs"], a["ys"], a["ring_offsets"],
        b["kind"], b["xs"], b["ys"], b["ring_offsets"]))


def _discrete_frechet(px, py, qx, qy):
    """Eiter–Mannila discrete Fréchet: DP over the coupling lattice."""
    n, m = px.shape[0], qx.shape[0]
    d = np.hypot(px[:, None] - qx[None, :], py[:, None] - qy[None, :])
    ca = np.empty((n, m))
    ca[0, 0] = d[0, 0]
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1],
                               ca[i, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


def frechet_distance(df: DataFrame, *, geom_a: str = "geom_a",
                     geom_b: str = "geom_b",
                     out_col: str = "frechet") -> DataFrame:
    """Discrete Fréchet distance between two single-part linestring
    columns (kind 2, one part); other kinds/multiparts -> NULL since
    the metric needs a traversal order. Orientation matters — reversing
    one curve changes (usually raises) the distance; that asymmetry is
    the point of Fréchet vs Hausdorff."""

    @pandas_udf(T.DoubleType())
    def _f(ka: pd.Series, xa: pd.Series, ya: pd.Series, oa: pd.Series,
           kb: pd.Series, xb: pd.Series, yb: pd.Series,
           ob: pd.Series) -> pd.Series:
        out = np.full(len(xa), np.nan)
        for i in range(len(xa)):
            for k, o in ((ka.iloc[i], oa.iloc[i]), (kb.iloc[i], ob.iloc[i])):
                if (k is None or pd.isna(k) or int(k) != 2
                        or (o is not None and len(o) > 2)):
                    break
            else:
                out[i] = _discrete_frechet(
                    np.asarray(xa.iloc[i], np.float64),
                    np.asarray(ya.iloc[i], np.float64),
                    np.asarray(xb.iloc[i], np.float64),
                    np.asarray(yb.iloc[i], np.float64))
        return pd.Series(out)

    a, b = F.col(geom_a), F.col(geom_b)
    return df.withColumn(out_col, _f(
        a["kind"], a["xs"], a["ys"], a["ring_offsets"],
        b["kind"], b["xs"], b["ys"], b["ring_offsets"]))


def closest_point(df: DataFrame, *, geom_a: str = "geom_a",
                  geom_b: str = "geom_b",
                  out_col: str = "closest") -> DataFrame:
    """ST_ClosestPoint / ST_ShortestLine analog: for each row, the pair
    of nearest points — one ON geometry A, one ON geometry B — and
    their distance. A's candidate set is its vertices plus the
    projections of B's vertices onto A's segments (and vice versa);
    for the min-distance pair one endpoint is always a vertex of one
    geometry projected onto the other, so this is EXACT for
    non-crossing geometries (crossing geometries return distance 0 at
    a crossing vertex-projection, matching PostGIS up to which contact
    point is reported). Rings closed like `hausdorff_distance`.

    Output struct: (ax, ay, bx, by, dist); NULL if either side NULL."""
    out_type = T.StructType([
        T.StructField("ax", T.DoubleType()),
        T.StructField("ay", T.DoubleType()),
        T.StructField("bx", T.DoubleType()),
        T.StructField("by", T.DoubleType()),
        T.StructField("dist", T.DoubleType()),
    ])

    def _proj(px, py, parts):
        """For each point, nearest location on `parts` + distance."""
        bx = np.full(px.shape[0], np.nan)
        by = np.full(px.shape[0], np.nan)
        bd = np.full(px.shape[0], np.inf)
        for rx, ry in parts:
            if rx.shape[0] == 1:
                d = np.hypot(px - rx[0], py - ry[0])
                m = d < bd
                bd[m] = d[m]
                bx[m], by[m] = rx[0], ry[0]
                continue
            for i in range(rx.shape[0] - 1):
                dx, dy = rx[i + 1] - rx[i], ry[i + 1] - ry[i]
                ln = dx * dx + dy * dy
                if ln == 0.0:
                    t = np.zeros(px.shape[0])
                else:
                    t = np.clip(((px - rx[i]) * dx + (py - ry[i]) * dy)
                                / ln, 0.0, 1.0)
                qx, qy = rx[i] + t * dx, ry[i] + t * dy
                d = np.hypot(px - qx, py - qy)
                m = d < bd
                bd[m] = d[m]
                bx[m], by[m] = qx[m], qy[m]
        return bx, by, bd

    @pandas_udf(out_type)
    def _cp(ka: pd.Series, xa: pd.Series, ya: pd.Series, oa: pd.Series,
            kb: pd.Series, xb: pd.Series, yb: pd.Series,
            ob: pd.Series) -> pd.DataFrame:
        cols = {k: [] for k in ("ax", "ay", "bx", "by", "dist")}
        for i in range(len(xa)):
            if (ka.iloc[i] is None or pd.isna(ka.iloc[i])
                    or kb.iloc[i] is None or pd.isna(kb.iloc[i])):
                for k in cols:
                    cols[k].append(None)
                continue
            pa = _closed_parts(xa.iloc[i], ya.iloc[i], oa.iloc[i],
                               int(ka.iloc[i]))
            pb = _closed_parts(xb.iloc[i], yb.iloc[i], ob.iloc[i],
                               int(kb.iloc[i]))
            vax = np.concatenate([p[0] for p in pa])
            vay = np.concatenate([p[1] for p in pa])
            vbx = np.concatenate([p[0] for p in pb])
            vby = np.concatenate([p[1] for p in pb])
            # A vertices -> B, and B vertices -> A
            qbx, qby, dab = _proj(vax, vay, pb)
            qax, qay, dba = _proj(vbx, vby, pa)
            ia, ib = int(dab.argmin()), int(dba.argmin())
            if dab[ia] <= dba[ib]:
                ax_, ay_ = float(vax[ia]), float(vay[ia])
                bx_, by_ = float(qbx[ia]), float(qby[ia])
                d = float(dab[ia])
            else:
                ax_, ay_ = float(qax[ib]), float(qay[ib])
                bx_, by_ = float(vbx[ib]), float(vby[ib])
                d = float(dba[ib])
            cols["ax"].append(ax_); cols["ay"].append(ay_)
            cols["bx"].append(bx_); cols["by"].append(by_)
            cols["dist"].append(d)
        return pd.DataFrame(cols)

    a, b = F.col(geom_a), F.col(geom_b)
    out = df.withColumn(out_col, _cp(
        a["kind"], a["xs"], a["ys"], a["ring_offsets"],
        b["kind"], b["xs"], b["ys"], b["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.dist").isNotNull(),
                        F.col(out_col)))
