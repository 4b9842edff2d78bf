"""Point buffering — the ST_Buffer(point, r) analog.

Reference semantics: PostGIS `ST_Buffer` produces an n-segment circle
approximation around each point (quad_segs × 4 vertices); the reference's
SQL templates use it for "features within distance" staging and for
visual/area products. Here the polygon is generated ENTIRELY inside JVM
codegen: ``transform(sequence(0, n-1), i -> center + r·(cos, sin)(2πi/n))``
— no Python, no UDF, one projection. Output is the engine's standard
struct-of-arrays geometry (kind=3, CCW ring, bbox), so buffers flow
directly into tag/overlay/trim/zonal.

``radius`` may be a Column (per-row radii). metric='planar' buffers in
degrees; 'haversine' takes meters and stretches longitude by 1/cos(lat)
(the small-circle approximation every planar-buffer-on-geography tool
makes; exact geodesic buffering is a different operator class). Buffers
crossing the antimeridian or poles are not re-split — the caller clips.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spandex_spark.geom import EARTH_RADIUS_M

_DEG_M = EARTH_RADIUS_M * math.pi / 180.0


def buffer_points(df: DataFrame, *, radius, segments: int = 16,
                  lon_col: str = "lon", lat_col: str = "lat",
                  metric: str = "planar", out_col: str = "geom") -> DataFrame:
    """Append an n-gon buffer polygon column around each (lon, lat) row.

    Metrics: 'planar' (radius in CRS units), 'haversine' (meters, the
    small-circle ellipse approximation: 1/cos φ lon stretch), or
    'geodesic' (meters, EXACT: each vertex is the great-circle
    destination point at the radius along its azimuth —
    geodesy.project_expr, still pure codegen)."""
    if metric not in ("planar", "haversine", "geodesic"):
        raise ValueError(f"unknown metric {metric!r}")
    if segments < 3:
        raise ValueError("segments must be >= 3")
    r = radius if isinstance(radius, Column) else F.lit(float(radius))
    lon, lat = F.col(lon_col), F.col(lat_col)
    step = 2.0 * math.pi / segments
    i = F.sequence(F.lit(0), F.lit(segments - 1))
    if metric == "geodesic":
        from spandex_spark.functions.geodesy import project_expr

        # negative bearing steps: bearings grow CLOCKWISE from north, so
        # walking them backwards keeps the ring CCW like the planar path
        def _vx(k):
            return project_expr(lon, lat, r,
                                k.cast("double") * F.lit(-step))["lon"]

        def _vy(k):
            return project_expr(lon, lat, r,
                                k.cast("double") * F.lit(-step))["lat"]

        xs = F.transform(i, _vx)
        ys = F.transform(i, _vy)
        geom = F.struct(
            F.lit(3).cast("tinyint").alias("kind"),
            xs.alias("xs"), ys.alias("ys"),
            F.array(F.lit(0), F.lit(segments)).alias("ring_offsets"),
            F.struct(F.array_min(xs).alias("minx"),
                     F.array_min(ys).alias("miny"),
                     F.array_max(xs).alias("maxx"),
                     F.array_max(ys).alias("maxy")).alias("bbox"))
        return df.withColumn(out_col, geom)
    if metric == "haversine":
        ry = r / F.lit(_DEG_M)
        rx = ry / F.cos(F.radians(lat))
    else:
        rx = ry = r
    xs = F.transform(i, lambda k: lon + rx * F.cos(k.cast("double")
                                                  * F.lit(step)))
    ys = F.transform(i, lambda k: lat + ry * F.sin(k.cast("double")
                                                   * F.lit(step)))
    geom = F.struct(
        F.lit(3).cast("tinyint").alias("kind"),
        xs.alias("xs"), ys.alias("ys"),
        F.array(F.lit(0), F.lit(segments)).alias("ring_offsets"),
        F.struct((lon - rx).alias("minx"), (lat - ry).alias("miny"),
                 (lon + rx).alias("maxx"), (lat + ry).alias("maxy"))
        .alias("bbox"))
    return df.withColumn(out_col, geom)


def buffer_polygons(df: DataFrame, *, radius: float, segments: int = 16,
                    geom_col: str = "geom", metric: str = "planar",
                    out_col: str = "geom_buffered") -> DataFrame:
    """ST_Buffer(polygon, r) for single-ring polygons, convex OR concave:
    each edge offsets outward by ``radius`` and each convex vertex grows a
    polygonal arc between its adjacent edge normals, stepped on the global
    2π/``segments`` angle lattice — the rounded-polygon construction
    PostGIS's quad_segs approximation produces, built per row in one
    Arrow-vectorized pandas UDF (no shuffle).

    CONVEX rings take the direct path (offsets are self-intersection-free,
    the boundary is written out in one walk). CONCAVE rings go through the
    planar-arrangement union (geom.union_rings) of {the ring itself, one
    outward offset rectangle per edge, one corner fan per convex vertex} —
    at reflex vertices adjacent offset strips cross and the arrangement
    clips them to their envelope, exactly PostGIS's buffer topology
    (a buffer may even close a narrow inlet into a hole; the arrangement
    emits the hole ring). Multi-part / holed inputs return NULL (inward
    hole erosion is a different operator class — documented boundary).

    Closed forms the driver oracles check (axis-aligned, segments % 4
    == 0): rounded rect area = w·h + 2(w+h)·r + ½·s·r²·sin(2π/s) with
    s + 4 vertices; the L-shape (5 convex + 1 reflex right angle) buffers
    to area = A + P·r + 5·(s/4)·(r²·sin(2π/s)/2) − r² with
    5·(s/4 + 1) + 1 vertices (the −r² is the double-counted strip
    overlap square at the reflex corner; the +1 its single envelope
    vertex) — the buffer_lshape query.

    ``metric='geodesic'`` buffers in METERS on the sphere: each row
    projects through a local azimuthal-equidistant frame tangent at the
    ring's vertex mean (geom.lonlat_to_aeqd — exact distance+azimuth
    from the center), buffers planar there, and inverse-projects the
    result — the PostGIS geography ST_Buffer construction.  Accuracy
    contract: distances from the tangent point are exact; the buffer
    band itself distorts O((feature extent / R_earth)²), negligible for
    parcel/city-scale features and documented for callers buffering
    continent-sized rings."""
    from spandex_spark import geom as _geom
    from spandex_spark.operators.trim import _GEOM_TYPE
    if radius <= 0:
        raise ValueError("radius must be positive")
    if segments < 4:
        raise ValueError("segments must be >= 4")
    if metric not in ("planar", "geodesic"):
        raise ValueError(f"unknown metric {metric!r}")
    geodesic = metric == "geodesic"
    step = 2.0 * math.pi / segments

    def _arc_points(vx, vy, a0, a1_nx, a1_ny):
        """Lattice-stepped arc points strictly between angle a0 and the
        angle of (a1_nx, a1_ny), walking CCW. Returns list of (x, y)."""
        a1 = math.atan2(a1_ny, a1_nx)
        sweep = (a1 - a0) % (2.0 * math.pi)
        pts = []
        k0 = math.ceil(round(a0 / step, 9))
        while (k0 * step - a0) % (2.0 * math.pi) <= sweep + 1e-12:
            ang = k0 * step
            pts.append((vx + radius * math.cos(ang),
                        vy + radius * math.sin(ang)))
            k0 += 1
        return pts

    def _buffer_concave(rx, ry):
        """Arrangement-union buffer for a simple CCW ring with reflex
        vertices. Returns list of (xs, ys) rings or None."""
        n = rx.shape[0]
        polys = [(rx, ry, None)]
        for i in range(n):
            j = (i + 1) % n
            ex, ey = rx[j] - rx[i], ry[j] - ry[i]
            ln = math.hypot(ex, ey)
            if ln == 0:
                continue
            nx_, ny_ = ey / ln, -ex / ln
            ox, oy = radius * nx_, radius * ny_
            # outward offset rectangle of edge i, CCW
            polys.append((np.array([rx[i], rx[i] + ox, rx[j] + ox, rx[j]]),
                          np.array([ry[i], ry[i] + oy, ry[j] + oy, ry[j]]),
                          None))
            # corner fan at vertex j if convex (left turn)
            k = (j + 1) % n
            fx, fy = rx[k] - rx[j], ry[k] - ry[j]
            fln = math.hypot(fx, fy)
            if fln == 0:
                continue
            if ex * fy - ey * fx <= 0:
                continue  # reflex or straight: no fan
            fnx, fny = fy / fln, -fx / fln
            a0 = math.atan2(ny_, nx_)
            fan_x = [rx[j], rx[j] + ox]
            fan_y = [ry[j], ry[j] + oy]
            for px_, py_ in _arc_points(rx[j], ry[j], a0, fnx, fny):
                if (abs(px_ - fan_x[-1]) > 1e-12
                        or abs(py_ - fan_y[-1]) > 1e-12):
                    fan_x.append(px_)
                    fan_y.append(py_)
            ex2, ey2 = rx[j] + radius * fnx, ry[j] + radius * fny
            if abs(ex2 - fan_x[-1]) > 1e-12 or abs(ey2 - fan_y[-1]) > 1e-12:
                fan_x.append(ex2)
                fan_y.append(ey2)
            if len(fan_x) >= 3:
                polys.append((np.array(fan_x), np.array(fan_y), None))
        return _geom.union_rings(polys) or None

    @pandas_udf(_GEOM_TYPE)
    def _buf(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, ooffs, bbs = [], [], [], [], []
        for x_arr, y_arr, o_arr in zip(xs, ys, offs):
            rx = np.asarray(x_arr, np.float64)
            ry = np.asarray(y_arr, np.float64)
            # drop duplicated consecutive vertices up front: they carry no
            # geometry, pass the convexity test (cross == 0), and would
            # divide by a zero edge length below
            if rx.shape[0] > 1:
                dup = (rx == np.roll(rx, 1)) & (ry == np.roll(ry, 1))
                if dup.any():
                    rx, ry = rx[~dup], ry[~dup]
            multi = o_arr is not None and len(o_arr) > 2
            if multi or rx.shape[0] < 3:
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            if geodesic:
                # tangent longitude via first-vertex unwrapping: a raw
                # mean of lons puts an antimeridian-straddling ring's
                # tangent ~180 deg away, at the projection's antipodal
                # singularity (found in review)
                rel = (rx - rx[0] + 180.0) % 360.0 - 180.0
                lon0 = float(rx[0] + rel.mean())
                if lon0 >= 180.0:
                    lon0 -= 360.0
                elif lon0 < -180.0:
                    lon0 += 360.0
                lat0 = float(ry.mean())
                rx, ry = _geom.lonlat_to_aeqd(rx, ry, lon0, lat0)
            if _geom.shoelace_area(rx, ry) < 0:
                rx, ry = rx[::-1].copy(), ry[::-1].copy()
            if not _geom._is_convex_ccw(rx, ry):
                merged = _buffer_concave(rx, ry)
                if not merged:
                    kinds.append(None); oxs.append(None); oys.append(None)
                    ooffs.append(None); bbs.append(None)
                    continue
                ax = np.concatenate([m[0] for m in merged])
                ay = np.concatenate([m[1] for m in merged])
                if geodesic:
                    ax, ay = _geom.aeqd_to_lonlat(ax, ay, lon0, lat0)
                ro = np.cumsum([0] + [m[0].shape[0] for m in merged])
                kinds.append(3 if len(merged) == 1 else 6)
                oxs.append(ax.tolist()); oys.append(ay.tolist())
                ooffs.append([int(v) for v in ro])
                bbs.append({"minx": float(ax.min()), "miny": float(ay.min()),
                            "maxx": float(ax.max()), "maxy": float(ay.max())})
                continue
            n = rx.shape[0]
            bx, by = [], []
            for i in range(n):
                j = (i + 1) % n
                ex, ey = rx[j] - rx[i], ry[j] - ry[i]
                ln = math.hypot(ex, ey)
                if ln == 0:
                    continue
                nx_, ny_ = ey / ln, -ex / ln          # outward (CCW ring)
                # incoming edge normal at vertex i
                h = (i - 1) % n
                pex, pey = rx[i] - rx[h], ry[i] - ry[h]
                pln = math.hypot(pex, pey)
                pnx, pny = pey / pln, -pex / pln
                # arc at vertex i from incoming normal to outgoing normal,
                # stepping on the global angle lattice (k*step)
                a0 = math.atan2(pny, pnx)
                a1 = math.atan2(ny_, nx_)
                sweep = (a1 - a0) % (2.0 * math.pi)
                k0 = math.ceil(round(a0 / step, 9))
                while (k0 * step - a0) % (2.0 * math.pi) <= sweep + 1e-12:
                    ang = k0 * step
                    bx.append(rx[i] + radius * math.cos(ang))
                    by.append(ry[i] + radius * math.sin(ang))
                    k0 += 1
                # end of arc: offset start of edge i (exactly on normal)
                bx.append(rx[i] + radius * nx_)
                by.append(ry[i] + radius * ny_)
                bx.append(rx[j] + radius * nx_)
                by.append(ry[j] + radius * ny_)
            ax = np.asarray(bx); ay = np.asarray(by)
            # drop consecutive duplicates (arc endpoint == edge offset when
            # the normal lands exactly on the lattice)
            keep = np.ones(ax.shape[0], bool)
            prev = ax.shape[0] - 1
            for i2 in range(ax.shape[0]):
                if (abs(ax[i2] - ax[prev]) < 1e-12
                        and abs(ay[i2] - ay[prev]) < 1e-12):
                    keep[i2] = False
                else:
                    prev = i2
            ax, ay = ax[keep], ay[keep]
            if geodesic:
                ax, ay = _geom.aeqd_to_lonlat(ax, ay, lon0, lat0)
            kinds.append(3)
            oxs.append(ax.tolist()); oys.append(ay.tolist())
            ooffs.append([0, int(ax.shape[0])])
            bbs.append({"minx": float(ax.min()), "miny": float(ay.min()),
                        "maxx": float(ax.max()), "maxy": float(ay.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": ooffs, "bbox": bbs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _buf(g["xs"], g["ys"], g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))


def erode_polygons(df: DataFrame, *, radius: float, segments: int = 16,
                   geom_col: str = "geom",
                   out_col: str = "geom_eroded") -> DataFrame:
    """ST_Buffer(polygon, -r) — morphological EROSION, the negative-radius
    buffer buffer_polygons declines: the output region is every point of
    P at distance > ``radius`` from P's boundary.

    Construction (per row, one Arrow-vectorized pandas UDF, no shuffle):
    erosion(P, r) = P \\ (∂P ⊕ disk_r).  The boundary dilation is built
    as one ±r offset rectangle per edge plus one ``segments``-gon disk
    per vertex (the capsule decomposition), and the subtraction runs
    through the planar-arrangement boolean kernel (geom.boolean_rings
    'difference') — the same machinery as the concave buffer path above,
    pointed inward.  Because membership in the kernel is even-odd, HOLED
    and MULTIPART inputs work directly (holes dilate, outers shrink),
    unlike the outward buffer's single-ring contract.

    Approximation convention matches buffer_polygons/PostGIS quad_segs:
    disks are inscribed polygons on the global 2π/``segments`` angle
    lattice, so the eroded region is slightly LARGER than the true
    erosion near reflex-corner arcs (by at most r·(1−cos(π/segments)));
    straight edges and convex right angles of the erosion are EXACT —
    a rectangle erodes to the exact (w−2r)×(h−2r) rectangle, the donut
    fixture to the exact 7×7-minus-5×5 ring pair (pytested closed
    forms).  Fully-eroded rows (r ≥ inradius) come out NULL, as do
    degenerate inputs — the same NULL contract as buffer_polygons.

    Reference semantics: PostGIS ST_Buffer(geom, negative) via GEOS
    BufferOp; spandex reaches it through its SQL templates
    (spandex/spatialtoolz.py delegates all geometry to PostGIS).
    """
    from spandex_spark import geom as _geom
    from spandex_spark.operators.trim import _GEOM_TYPE
    if radius <= 0:
        raise ValueError("radius must be positive (erosion distance)")
    if segments < 4:
        raise ValueError("segments must be >= 4")
    step = 2.0 * math.pi / segments
    disk_cos = np.cos(np.arange(segments) * step)
    disk_sin = np.sin(np.arange(segments) * step)

    @pandas_udf(_GEOM_TYPE)
    def _erode(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, ooffs, bbs = [], [], [], [], []
        for x_arr, y_arr, o_arr in zip(xs, ys, offs):
            if x_arr is None or len(x_arr) < 3:
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            px = np.asarray(x_arr, np.float64)
            py = np.asarray(y_arr, np.float64)
            offsets = (np.asarray(o_arr, np.int64)
                       if o_arr is not None and len(o_arr) > 2 else
                       np.array([0, px.shape[0]], np.int64))
            if len(offsets) == 2:
                # CONVEX fast path: erosion of a convex polygon is the
                # intersection of its inward-offset half-planes — an
                # exact polygon with no arcs, one Sutherland-Hodgman
                # clip per edge, no arrangement (parcels/rect layers
                # take this; measured ~40x the capsule path)
                rx, ry = px.copy(), py.copy()
                if rx.shape[0] > 1:
                    dup = (rx == np.roll(rx, 1)) & (ry == np.roll(ry, 1))
                    if dup.any():
                        rx, ry = rx[~dup], ry[~dup]
                if rx.shape[0] >= 3:
                    if _geom.shoelace_area(rx, ry) < 0:
                        rx, ry = rx[::-1].copy(), ry[::-1].copy()
                    if _geom._is_convex_ccw(rx, ry):
                        cx, cy = rx, ry
                        n0 = rx.shape[0]
                        for i in range(n0):
                            if cx.shape[0] < 3:
                                break
                            j = (i + 1) % n0
                            ex, ey = rx[j] - rx[i], ry[j] - ry[i]
                            ln = math.hypot(ex, ey)
                            # inward normal of a CCW ring is (-ey, ex)/ln
                            nx_, ny_ = -ey / ln, ex / ln
                            # keep points with signed dist >= radius
                            d = ((cx - rx[i]) * nx_ + (cy - ry[i]) * ny_
                                 - radius)
                            if (d >= -1e-12).all():
                                continue
                            kx, ky = [], []
                            m = cx.shape[0]
                            for a in range(m):
                                b = (a + 1) % m
                                da, db = d[a], d[b]
                                if da >= -1e-12:
                                    kx.append(cx[a]); ky.append(cy[a])
                                if (da >= -1e-12) != (db >= -1e-12):
                                    t = da / (da - db)
                                    kx.append(cx[a] + t * (cx[b] - cx[a]))
                                    ky.append(cy[a] + t * (cy[b] - cy[a]))
                            cx = np.asarray(kx); cy = np.asarray(ky)
                        if cx.shape[0] >= 3 and abs(
                                _geom.shoelace_area(cx, cy)) > 1e-15:
                            kinds.append(3)
                            oxs.append(cx.tolist()); oys.append(cy.tolist())
                            ooffs.append([0, int(cx.shape[0])])
                            bbs.append({"minx": float(cx.min()),
                                        "miny": float(cy.min()),
                                        "maxx": float(cx.max()),
                                        "maxy": float(cy.max())})
                        else:
                            kinds.append(None); oxs.append(None)
                            oys.append(None); ooffs.append(None)
                            bbs.append(None)
                        continue
            capsules = []
            clean_x, clean_y, clean_off = [], [], [0]
            ok = True
            for r0, r1 in zip(offsets[:-1], offsets[1:]):
                rx, ry = px[r0:r1], py[r0:r1]
                if rx.shape[0] > 1:
                    # zero-length edges carry no geometry and would both
                    # divide by zero below and feed degenerate segments
                    # to the arrangement
                    dup = (rx == np.roll(rx, 1)) & (ry == np.roll(ry, 1))
                    if dup.any():
                        rx, ry = rx[~dup], ry[~dup]
                if rx.shape[0] < 3:
                    ok = False
                    break
                clean_x.append(rx); clean_y.append(ry)
                clean_off.append(clean_off[-1] + rx.shape[0])
                n = rx.shape[0]
                for i in range(n):
                    j = (i + 1) % n
                    ex, ey = rx[j] - rx[i], ry[j] - ry[i]
                    ln = math.hypot(ex, ey)
                    if ln > 0:
                        ox_, oy_ = radius * ey / ln, -radius * ex / ln
                        capsules.append((
                            np.array([rx[i] + ox_, rx[j] + ox_,
                                      rx[j] - ox_, rx[i] - ox_]),
                            np.array([ry[i] + oy_, ry[j] + oy_,
                                      ry[j] - oy_, ry[i] - oy_]), None))
                    capsules.append((rx[i] + radius * disk_cos,
                                     ry[i] + radius * disk_sin, None))
            merged = None
            if ok:
                # all cleaned rings in ONE even-odd entry: holes must
                # stay holes (separate entries would OR them away)
                merged = _geom.boolean_rings(
                    [(np.concatenate(clean_x), np.concatenate(clean_y),
                      np.array(clean_off, np.int64)
                      if len(clean_off) > 2 else None)],
                    capsules, "difference")
            if not merged:
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            ax = np.concatenate([m[0] for m in merged])
            ay = np.concatenate([m[1] for m in merged])
            ro = np.cumsum([0] + [m[0].shape[0] for m in merged])
            kinds.append(3 if len(merged) == 1 else 6)
            oxs.append(ax.tolist()); oys.append(ay.tolist())
            ooffs.append([int(v) for v in ro])
            bbs.append({"minx": float(ax.min()), "miny": float(ay.min()),
                        "maxx": float(ax.max()), "maxy": float(ay.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": ooffs, "bbox": bbs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _erode(g["xs"], g["ys"], g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))
