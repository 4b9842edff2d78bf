"""Minimum bounding circle and oriented envelope — the
ST_MinimumBoundingRadius / ST_MinimumBoundingCircle / ST_OrientedEnvelope
analogs.

Reference semantics: PostGIS computes these per geometry (GEOS
`MinimumBoundingCircle` / `MinimumDiameter`); spandex-scale layers use
them as shape descriptors (compactness = area / circle area, elongation
from the envelope aspect) and as cheap prefilters before expensive
kernels. Mirrored here as per-row Arrow-batched pandas UDFs over the
numpy kernels (geom.min_enclosing_circle, geom.oriented_envelope) — the
same per-feature shape as simplify/convex_hull: embarrassingly parallel,
no shuffle, vertex counts bounded by the feature (the bounded-feature
contract shared with `operators/buffer.py`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom
from spandex_spark.operators.trim import _GEOM_TYPE

_CIRCLE_TYPE = T.StructType([
    T.StructField("cx", T.DoubleType()),
    T.StructField("cy", T.DoubleType()),
    T.StructField("radius", T.DoubleType()),
])


def bounding_circle(df: DataFrame, *, geom_col: str = "geom",
                    out_col: str = "mbc",
                    segments: int = 0) -> DataFrame:
    """ST_MinimumBoundingRadius analog: appends ``out_col`` =
    struct(cx, cy, radius) — the EXACT minimum enclosing circle of every
    vertex of the geometry (all rings; holes cannot extend it; the
    answer is unique so it is partitioning/order independent).

    With ``segments > 0`` also appends ``<out_col>_geom``, the
    ST_MinimumBoundingCircle-style n-gon INSCRIBED approximation
    (vertices ON the circle, the PostGIS convention — its area is below
    pi*r^2 by the usual n-gon deficit). NULL geometry -> NULL outputs."""

    @pandas_udf(_CIRCLE_TYPE)
    def _mbc(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        cxs, cys, rs = [], [], []
        for x_arr, y_arr in zip(xs, ys):
            if x_arr is None or len(x_arr) == 0:
                cxs.append(None); cys.append(None); rs.append(None)
                continue
            cx, cy, r = _geom.min_enclosing_circle(
                np.asarray(x_arr, np.float64), np.asarray(y_arr, np.float64))
            cxs.append(cx); cys.append(cy); rs.append(r)
        return pd.DataFrame({"cx": cxs, "cy": cys, "radius": rs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _mbc(g["xs"], g["ys"]))
    out = out.withColumn(
        out_col, F.when(F.col(f"{out_col}.radius").isNotNull(),
                        F.col(out_col)))
    if segments > 0:
        if segments < 3:
            raise ValueError("segments must be >= 3")
        c = F.col(out_col)
        idx = F.sequence(F.lit(0), F.lit(segments - 1))
        step = 2.0 * math.pi / segments
        px = F.transform(idx, lambda i: c["cx"] + c["radius"]
                         * F.cos(i * F.lit(step)))
        py = F.transform(idx, lambda i: c["cy"] + c["radius"]
                         * F.sin(i * F.lit(step)))
        ring = F.struct(
            F.lit(3).cast("tinyint").alias("kind"),
            px.alias("xs"), py.alias("ys"),
            F.array(F.lit(0), F.lit(segments)).alias("ring_offsets"),
            F.struct(F.array_min(px).alias("minx"),
                     F.array_min(py).alias("miny"),
                     F.array_max(px).alias("maxx"),
                     F.array_max(py).alias("maxy")).alias("bbox"))
        out = out.withColumn(f"{out_col}_geom",
                             F.when(c["radius"].isNotNull(), ring))
    return out


def oriented_envelope(df: DataFrame, *, geom_col: str = "geom",
                      out_col: str = "geom_env") -> DataFrame:
    """ST_OrientedEnvelope analog: the minimum-AREA rotated rectangle of
    every vertex of the geometry, as a 4-vertex CCW ring (plus
    ``<out_col>_area``). Degenerate geometries (point / collinear — no
    2D hull) yield NULL, mirroring convex_hull's contract."""
    env_type = T.StructType(list(_GEOM_TYPE) + [
        T.StructField("area", T.DoubleType())])

    @pandas_udf(env_type)
    def _env(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, offs, bbs, areas = [], [], [], [], [], []
        for x_arr, y_arr in zip(xs, ys):
            got = None
            if x_arr is not None and len(x_arr) >= 3:
                got = _geom.oriented_envelope(
                    np.asarray(x_arr, np.float64),
                    np.asarray(y_arr, np.float64))
            if got is None:
                kinds.append(None); oxs.append(None); oys.append(None)
                offs.append(None); bbs.append(None); areas.append(None)
                continue
            rx, ry, area = got
            kinds.append(3)
            oxs.append(rx.tolist()); oys.append(ry.tolist())
            offs.append([0, 4])
            bbs.append({"minx": float(rx.min()), "miny": float(ry.min()),
                        "maxx": float(rx.max()), "maxy": float(ry.max())})
            areas.append(float(area))
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys, "ring_offsets": offs,
                             "bbox": bbs, "area": areas})

    g = F.col(geom_col)
    raw = f"_{out_col}_raw"
    out = df.withColumn(raw, _env(g["xs"], g["ys"]))
    r = F.col(raw)
    return (out
            .withColumn(out_col, F.when(r["kind"].isNotNull(), F.struct(
                r["kind"].alias("kind"), r["xs"].alias("xs"),
                r["ys"].alias("ys"),
                r["ring_offsets"].alias("ring_offsets"),
                r["bbox"].alias("bbox"))))
            .withColumn(f"{out_col}_area", r["area"])
            .drop(raw))


def max_inscribed_circle(df: DataFrame, *, geom_col: str = "geom",
                         out_col: str = "mic",
                         precision: float | None = None) -> DataFrame:
    """ST_MaximumInscribedCircle analog: appends ``out_col`` =
    struct(cx, cy, radius) — the largest circle contained in the polygon
    (center = the polygon's "pole of inaccessibility", the canonical
    label point; radius = the inradius, the setback/clearance number).

    Algorithm: polylabel (Mapbox, 2016; same quadtree refinement GEOS
    uses for MaximumInscribedCircle) — a best-first search over cells
    bounded by center_distance + cell_radius, signed distance =
    ±min(point-to-boundary-segment) with the sign from even-odd
    containment, vertex loops vectorized over segments.  Deterministic:
    the heap tie-breaks on insertion order and cells subdivide in a
    fixed order, so equal-potential plateaus (e.g. a rectangle's long
    axis) always return the same center.  ``precision`` defaults to
    max(width, height) / 1000 — the PostGIS/GEOS default tolerance; the
    returned radius is within ``precision`` of the true inradius.
    (Plateaued shapes make the search cost scale as ~plateau_length /
    precision cells, so sub-default precisions are a deliberate spend;
    the returned center/radius pair is always self-consistent —
    radius == its own boundary distance — regardless of precision.)  Holes are respected (even-odd
    containment); NULL/degenerate rows come out NULL.  Per-row Arrow
    pandas UDF, zero shuffles — the bounded-feature contract of this
    module.

    Reference semantics: PostGIS ST_MaximumInscribedCircle (GEOS 3.9);
    spandex reaches label points via PostGIS ST_PointOnSurface-style
    SQL templates (spandex/spatialtoolz.py).
    """
    import heapq

    @pandas_udf(_CIRCLE_TYPE)
    def _mic(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.DataFrame:
        cxs, cys, rs = [], [], []
        for x_arr, y_arr, o_arr in zip(xs, ys, offs):
            if x_arr is None or len(x_arr) < 3:
                cxs.append(None); cys.append(None); rs.append(None)
                continue
            px = np.asarray(x_arr, np.float64)
            py = np.asarray(y_arr, np.float64)
            offsets = (np.asarray(o_arr, np.int64)
                       if o_arr is not None and len(o_arr) > 2 else
                       np.array([0, px.shape[0]], np.int64))
            # segment soup over all rings (each ring closes on itself)
            sax, say, sbx, sby = [], [], [], []
            for r0, r1 in zip(offsets[:-1], offsets[1:]):
                rx, ry = px[r0:r1], py[r0:r1]
                if rx.shape[0] < 3:
                    continue
                sax.append(rx); say.append(ry)
                sbx.append(np.roll(rx, -1)); sby.append(np.roll(ry, -1))
            if not sax:
                cxs.append(None); cys.append(None); rs.append(None)
                continue
            ax = np.concatenate(sax); ay = np.concatenate(say)
            bx = np.concatenate(sbx); by = np.concatenate(sby)
            ex, ey = bx - ax, by - ay
            el2 = ex * ex + ey * ey
            el2[el2 == 0] = 1.0
            ro = offsets if len(offsets) > 2 else None

            def signed_dist(qx, qy):
                t = np.clip(((qx - ax) * ex + (qy - ay) * ey) / el2, 0, 1)
                d = np.hypot(qx - (ax + t * ex), qy - (ay + t * ey)).min()
                inside = _geom.points_in_rings(
                    np.array([qx]), np.array([qy]), px, py, ro)[0]
                return d if inside else -d

            minx, miny = px.min(), py.min()
            maxx, maxy = px.max(), py.max()
            w, hgt = maxx - minx, maxy - miny
            eps = precision if precision is not None else \
                max(w, hgt) / 1000.0
            half = min(w, hgt) / 2.0
            if half == 0.0:
                cxs.append(None); cys.append(None); rs.append(None)
                continue
            # seed grid + centroid candidate (polylabel's initialization)
            heap, counter = [], 0
            best_x = best_y = None
            best_d = -math.inf
            gx0 = minx
            while gx0 < maxx:
                gy0 = miny
                while gy0 < maxy:
                    qx, qy = gx0 + half, gy0 + half
                    d = signed_dist(qx, qy)
                    if d > best_d:
                        best_d, best_x, best_y = d, qx, qy
                    heapq.heappush(
                        heap, (-(d + half * math.sqrt(2.0)), counter,
                               qx, qy, half))
                    counter += 1
                    gy0 += 2 * half
                gx0 += 2 * half
            while heap:
                npot, _, qx, qy, h = heapq.heappop(heap)
                if -npot - best_d <= eps:
                    break
                h2 = h / 2.0
                for dx_ in (-h2, h2):
                    for dy_ in (-h2, h2):
                        nx_, ny_ = qx + dx_, qy + dy_
                        d = signed_dist(nx_, ny_)
                        if d > best_d:
                            best_d, best_x, best_y = d, nx_, ny_
                        if d + h2 * math.sqrt(2.0) > best_d + eps:
                            heapq.heappush(
                                heap, (-(d + h2 * math.sqrt(2.0)), counter,
                                       nx_, ny_, h2))
                            counter += 1
            if best_d <= 0:
                cxs.append(None); cys.append(None); rs.append(None)
            else:
                cxs.append(float(best_x)); cys.append(float(best_y))
                rs.append(float(best_d))
        return pd.DataFrame({"cx": cxs, "cy": cys, "radius": rs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _mic(g["xs"], g["ys"], g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.radius").isNotNull(),
                        F.col(out_col)))
