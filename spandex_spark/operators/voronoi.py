"""ST_VoronoiPolygons analog: bounded Voronoi cells per point group.

Reference semantics: PostGIS ST_VoronoiPolygons(collection, extend_to)
computes the diagram of ONE collection; spandex's templates apply such
collection functions per group. Mirrored here: ``group_col`` keys the
collections, the diagram is computed inside one
`groupBy().applyInPandas` kernel per group — the same bounded-group
contract as `simplify.convex_hull` (hull_parcels): a group is a
parcel/zone-sized point set, not the whole planet. The cross-group
fan-out is where the distribution lives.

Construction is the textbook half-plane intersection: every site's
cell starts as the clip box (group extent padded by ``margin``, or an
explicit ``bbox``) and is clipped by the perpendicular bisector of
(site, other) for every other site in the group — O(n² · clip) per
group, exact planar arithmetic, deterministic. Cells PARTITION the
clip box by construction: area-sum == box area is the pytest oracle,
alongside site-containment and the symmetric-grid closed form.

Output: (group_col, point id, site lon/lat, cell geometry struct,
cell area). Groups with a single site get the whole box.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from spandex_spark.operators.trim import _GEOM_TYPE


def _clip_halfplane(px: np.ndarray, py: np.ndarray, ax: float, ay: float,
                    bx: float, by: float):
    """Sutherland-Hodgman clip of polygon (px, py) to the half-plane of
    points closer to A=(ax,ay) than B=(bx,by):
    (B-A)·P <= (B-A)·midpoint."""
    nx_, ny_ = bx - ax, by - ay
    c = nx_ * (ax + bx) / 2.0 + ny_ * (ay + by) / 2.0
    d = nx_ * px + ny_ * py - c          # <= 0 inside
    out_x, out_y = [], []
    n = px.shape[0]
    for i in range(n):
        j = (i + 1) % n
        di, dj = d[i], d[j]
        if di <= 0:
            out_x.append(px[i]); out_y.append(py[i])
        if (di < 0) != (dj < 0) and di != dj:
            t = di / (di - dj)
            out_x.append(px[i] + t * (px[j] - px[i]))
            out_y.append(py[i] + t * (py[j] - py[i]))
    return np.asarray(out_x), np.asarray(out_y)


def voronoi_polygons(points: DataFrame, *, group_col: str,
                     point_id_col: str, lon_col: str = "lon",
                     lat_col: str = "lat", margin: float = 1.0,
                     bbox: tuple | None = None) -> DataFrame:
    """Bounded Voronoi cell per site, per group (module docstring)."""
    out_schema = T.StructType([
        T.StructField("group", points.schema[group_col].dataType),
        T.StructField("site_id", points.schema[point_id_col].dataType),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("cell", _GEOM_TYPE),
        T.StructField("area", T.DoubleType()),
    ])

    def diagram(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = key[0]
        sx = pdf[lon_col].to_numpy(np.float64)
        sy = pdf[lat_col].to_numpy(np.float64)
        ids = pdf[point_id_col].tolist()
        if bbox is not None:
            x0, y0, x1, y1 = map(float, bbox)
        else:
            x0, x1 = sx.min() - margin, sx.max() + margin
            y0, y1 = sy.min() - margin, sy.max() + margin
        rows = []
        for i in range(sx.shape[0]):
            px = np.array([x0, x1, x1, x0])
            py = np.array([y0, y0, y1, y1])
            # clip nearest bisectors first: the cell shrinks fastest, so
            # later (farther) sites mostly no-op
            order = np.argsort((sx - sx[i]) ** 2 + (sy - sy[i]) ** 2,
                               kind="stable")
            for j in order:
                if j == i or px.shape[0] == 0:
                    continue
                px, py = _clip_halfplane(px, py, sx[i], sy[i],
                                         float(sx[j]), float(sy[j]))
            if px.shape[0] < 3:
                cell, area = None, 0.0
            else:
                area = 0.5 * abs(np.dot(px, np.roll(py, -1))
                                 - np.dot(py, np.roll(px, -1)))
                cell = {"kind": 3, "xs": px.tolist(), "ys": py.tolist(),
                        "ring_offsets": [0, int(px.shape[0])],
                        "bbox": {"minx": float(px.min()),
                                 "miny": float(py.min()),
                                 "maxx": float(px.max()),
                                 "maxy": float(py.max())}}
            rows.append((g, ids[i], float(sx[i]), float(sy[i]),
                         cell, float(area)))
        return pd.DataFrame(rows, columns=["group", "site_id", "lon",
                                           "lat", "cell", "area"])

    out = (points.groupBy(group_col).applyInPandas(diagram, out_schema)
           .withColumnRenamed("group", group_col)
           .withColumnRenamed("site_id", point_id_col))
    return out


def _bowyer_watson(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Incremental Delaunay triangulation (Bowyer-Watson), float64
    in-circle via the standard 3x3 determinant on a CCW-oriented
    triangle. Returns index triples into ``pts``. O(n²) per group —
    the bounded-group contract.

    Cocircular ties (lattices, points sampled on a circle) are broken
    STRICT-INSIDE: |det| below a Hadamard-scaled epsilon counts as
    "not inside", so on-circle triangles stay put and any
    triangulation of the cocircular fan is kept (all are equally
    Delaunay). Raw ``det > 0.0`` lets float noise flip the tie per
    triangle and emits overlapping cavities — 181 triangles for 40
    cocircular points where Euler demands 38 (regression:
    tests/test_alpha_shape.py::test_cocircular_exact_threshold)."""
    n = pts.shape[0]
    cx, cy = pts.mean(axis=0)
    big = 1e3 * max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1e-9)
    verts = np.vstack([pts, [[cx - 3 * big, cy - big],
                             [cx + 3 * big, cy - big],
                             [cx, cy + 3 * big]]])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]

    def in_circle(t, p) -> bool:
        a, b, c = (verts[t[0]], verts[t[1]], verts[t[2]])
        # orient CCW
        if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
            b, c = c, b
        m = np.array([
            [a[0] - p[0], a[1] - p[1],
             (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1],
             (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1],
             (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2]])
        det = float(np.linalg.det(m))
        # Hadamard bound: |det| <= prod(row norms). 1e-12 of that is
        # ~1e4 above the f64 LU noise floor yet below any true signal
        # even when the bound is loose (the huge super-triangle vs a
        # far-away small cluster skews rows near-parallel; 1e-9 there
        # swallowed genuine insertions and emptied the triangulation).
        eps = 1e-12 * float(np.prod(np.linalg.norm(m, axis=1)))
        return det > eps

    for p_idx in range(n):
        p = verts[p_idx]
        bad = [t for t in tris if in_circle(t, p)]
        counts: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
                k = (min(e), max(e))
                counts[k] = counts.get(k, 0) + 1
        boundary = [e for e, c in counts.items() if c == 1]
        bad_set = set(bad)
        tris = [t for t in tris if t not in bad_set]
        tris += [(e[0], e[1], p_idx) for e in boundary]
    return [t for t in tris if max(t) < n]


def delaunay_triangles(points: DataFrame, *, group_col: str,
                       point_id_col: str, lon_col: str = "lon",
                       lat_col: str = "lat") -> DataFrame:
    """ST_DelaunayTriangles analog: the triangulation of each group's
    sites via Bowyer-Watson (NOT the bounded-Voronoi dual — a
    near-hull Delaunay edge's empty circle can be arbitrarily large,
    so any clipped dual drops edges; found the hard way, see
    tests/test_delaunay.py's radius-128 regression pair). Same
    bounded-group kernel contract as `voronoi_polygons`.

    Output: (group_col, id_a, id_b, id_c) vertex ids per triangle,
    sorted within the row; deterministic for a given group."""
    out_schema = T.StructType([
        T.StructField("group", points.schema[group_col].dataType),
        T.StructField("id_a", points.schema[point_id_col].dataType),
        T.StructField("id_b", points.schema[point_id_col].dataType),
        T.StructField("id_c", points.schema[point_id_col].dataType),
    ])

    def tri(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[[lon_col, lat_col]].to_numpy(np.float64)
        ids = pdf[point_id_col].tolist()
        rows = []
        if pts.shape[0] >= 3:
            for a, b, c in _bowyer_watson(pts):
                ta, tb, tc = sorted([ids[a], ids[b], ids[c]])
                rows.append((key[0], ta, tb, tc))
        return pd.DataFrame(rows, columns=["group", "id_a", "id_b", "id_c"])

    return (points.groupBy(group_col).applyInPandas(tri, out_schema)
            .withColumnRenamed("group", group_col))


def delaunay_edges(points: DataFrame, *, group_col: str,
                   point_id_col: str, lon_col: str = "lon",
                   lat_col: str = "lat") -> DataFrame:
    """Delaunay EDGES (the ST_DelaunayTriangles ``flags=1`` analog):
    the distinct undirected edges of `delaunay_triangles` — one
    distinct() over the exploded triangle edges, everything else
    inherited."""
    from pyspark.sql import functions as F
    tris = delaunay_triangles(points, group_col=group_col,
                              point_id_col=point_id_col,
                              lon_col=lon_col, lat_col=lat_col)
    edges = tris.select(
        group_col,
        F.explode(F.array(
            F.array("id_a", "id_b"),
            F.array("id_b", "id_c"),
            F.array("id_a", "id_c"))).alias("_e"))
    return (edges.select(group_col,
                         F.col("_e")[0].alias("id_a"),
                         F.col("_e")[1].alias("id_b"))
            .distinct())


def _alpha_boundary(pts: np.ndarray, tris: list, alpha: float):
    """Alpha-complex boundary for one group: keep triangles with
    circumradius <= alpha, orient each CCW, and walk the directed
    boundary edges (edges whose reverse is absent). Because every kept
    triangle is CCW, interior edges cancel in opposite directions and
    the walk emits outer rings CCW and hole rings CW — exactly the
    engine's even-odd convention (geom.py module docstring).

    Returns (rings, area, n_kept): rings = list of np index arrays,
    area = sum of kept-triangle areas (exact, independent of the ring
    walk), n_kept = surviving triangle count."""
    kept = []
    area = 0.0
    for a, b, c in tris:
        ax, ay = pts[a]
        bx, by = pts[b]
        cx, cy = pts[c]
        cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if cross < 0:           # orient CCW
            b, c = c, b
            bx, by, cx, cy = cx, cy, bx, by
            cross = -cross
        if cross == 0:
            continue            # degenerate sliver contributes nothing
        la = math.hypot(bx - ax, by - ay)
        lb = math.hypot(cx - bx, cy - by)
        lc = math.hypot(ax - cx, ay - cy)
        circum_r = (la * lb * lc) / (2.0 * cross)   # abc / (4 * area)
        if circum_r <= alpha:
            kept.append((a, b, c))
            area += 0.5 * cross
    directed = set()
    for a, b, c in kept:
        for e in ((a, b), (b, c), (c, a)):
            directed.add(e)
    boundary = [e for e in directed if (e[1], e[0]) not in directed]
    nxt: dict = {}
    for a, b in boundary:
        nxt.setdefault(a, []).append(b)
    rings = []
    while nxt:
        start = next(iter(nxt))
        ring = [start]
        cur = start
        while True:
            outs = nxt[cur]
            step = outs.pop()
            if not outs:
                del nxt[cur]
            ring.append(step)
            cur = step
            if cur == start:
                break
        rings.append(np.asarray(ring[:-1], dtype=np.int64))
    return rings, area, len(kept)


def alpha_shape(points: DataFrame, *, group_col: str,
                lon_col: str = "lon", lat_col: str = "lat",
                alpha: float) -> DataFrame:
    """ST_ConcaveHull analog (the classical alpha shape, Edelsbrunner
    1983): per group, the union of Delaunay triangles with circumradius
    <= ``alpha``. Unlike `simplify.convex_hull` this follows reflex
    coastlines, splits disjoint clusters into separate outer rings, and
    opens interior voids as CW hole rings (the per-domain page-footprint
    use case). Same bounded-group kernel contract as `voronoi_polygons`;
    the cross-group fan-out is where the distribution lives.

    Output: (group_col, geom (NULL when no triangle survives), area
    (even-odd exact, = sum of kept triangle areas), n_triangles)."""
    out_schema = T.StructType([
        T.StructField("group", points.schema[group_col].dataType),
        T.StructField("geom", _GEOM_TYPE),
        T.StructField("area", T.DoubleType()),
        T.StructField("n_triangles", T.IntegerType()),
    ])

    def shape(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[[lon_col, lat_col]].to_numpy(np.float64)
        geom, area, n_tri = None, 0.0, 0
        if pts.shape[0] >= 3:
            tris = _bowyer_watson(pts)
            rings, area, n_tri = _alpha_boundary(pts, tris, float(alpha))
            if rings:
                xs: list = []
                ys: list = []
                offs = [0]
                for r in rings:
                    xs.extend(pts[r, 0].tolist())
                    ys.extend(pts[r, 1].tolist())
                    offs.append(len(xs))
                geom = {"kind": 3 if len(rings) == 1 else 6,
                        "xs": xs, "ys": ys, "ring_offsets": offs,
                        "bbox": {"minx": min(xs), "miny": min(ys),
                                 "maxx": max(xs), "maxy": max(ys)}}
        return pd.DataFrame(
            [(key[0], geom, float(area), n_tri)],
            columns=["group", "geom", "area", "n_triangles"])

    return (points.groupBy(group_col).applyInPandas(shape, out_schema)
            .withColumnRenamed("group", group_col))
