"""Pure-numpy geometry kernels (no Spark, no shapely).

These are the exact-refine kernels behind the two-phase spatial joins
(SURVEY.md §2.2 E1). They replace what the reference delegates to PostGIS:
ST_Contains / ST_Centroid (spandex/spatialtoolz.py::tag),
ST_Intersection + ST_Area (spandex/spatialtoolz.py::proportion_overlap),
ST_IsValid (spandex/spatialtoolz.py::invalid_geometry_check),
and the <-> KNN distance (nearest-feature helper).

Polygon representation: struct-of-arrays. Rings are concatenated in
``xs``/``ys`` and delimited by ``ring_offsets`` (start offsets plus a
final end sentinel: ring r spans ``xs[off[r]:off[r+1]]``). Each ring is
stored OPEN (no repeated closing vertex). Orientation convention (the
GeoJSON/OGC one): exterior rings counter-clockwise (positive shoelace),
holes clockwise (negative). A multipolygon is simply several CCW rings.
Region semantics are EVEN-ODD: PIP is orientation-agnostic; the signed
area / inclusion-exclusion kernels rely on the orientation convention
(valid nesting: holes inside outers, parts disjoint — PostGIS ST_IsValid
preconditions, same as the reference assumes of its PostGIS layers).
``ring_offsets`` of None or [0, n] means one exterior ring.

Point-in-polygon boundary rule (documented per FIXTURES.md §3): the
half-open crossing test below makes left/bottom edges inclusive and
right/top edges exclusive on axis-aligned polygons — matching the
closed-form grid oracle ``zone_id = (floor(lat)+10)*20 + (floor(lon)+10)``.
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius


# ---------------------------------------------------------------- basics

def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed area of an open ring (positive = CCW)."""
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return 0.5 * float(np.sum(xs * y2 - x2 * ys))


def bbox(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def centroid(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """Area centroid of a simple polygon (falls back to vertex mean for
    degenerate zero-area rings)."""
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    cross = xs * y2 - x2 * ys
    a = 0.5 * np.sum(cross)
    if abs(a) < 1e-300:
        return float(xs.mean()), float(ys.mean())
    cx = float(np.sum((xs + x2) * cross) / (6.0 * a))
    cy = float(np.sum((ys + y2) * cross) / (6.0 * a))
    return cx, cy


# ---------------------------------------------------------------- rings

def rings_of(xs: np.ndarray, ys: np.ndarray, offsets) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split concatenated ring arrays into per-ring (xs, ys) views.
    ``offsets`` None/empty → the whole array is one exterior ring."""
    if offsets is None:
        return [(xs, ys)]
    off = np.asarray(offsets, dtype=np.int64)
    if off.shape[0] <= 2:
        return [(xs, ys)]
    return [(xs[off[r]:off[r + 1]], ys[off[r]:off[r + 1]])
            for r in range(off.shape[0] - 1)]


def rings_area(xs: np.ndarray, ys: np.ndarray, offsets=None) -> float:
    """Even-odd region area: Σ signed shoelace per ring (CCW outer positive,
    CW hole negative). Single-ring input returns |area| regardless of
    orientation (back-compat with unoriented simple polygons)."""
    rings = rings_of(xs, ys, offsets)
    if len(rings) == 1:
        return abs(shoelace_area(rings[0][0], rings[0][1]))
    return float(sum(shoelace_area(rx, ry) for rx, ry in rings))


def rings_perimeter(xs: np.ndarray, ys: np.ndarray, offsets=None) -> float:
    """ST_Perimeter analog: Σ over rings of the CLOSED ring length (hole
    boundaries count, per the PostGIS convention — the perimeter of a
    donut includes its inner edge)."""
    total = 0.0
    for rx, ry in rings_of(xs, ys, offsets):
        dx = np.roll(rx, -1) - rx
        dy = np.roll(ry, -1) - ry
        total += float(np.sqrt(dx * dx + dy * dy).sum())
    return total


def spherical_ring_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed spherical area (m²) of an OPEN lon/lat ring on the mean-Earth
    sphere — Chamberlain & Duquette (JPL 2007) line integral:
    A = -R²/2 · Σ Δλ_i · (2 + sin φ_i + sin φ_{i+1}), CCW positive.
    Exact for rings whose edges follow parallels/meridians (every lattice
    fixture); the standard small-edge approximation otherwise (PostGIS
    geography uses the same family). Δλ wraps to (-π, π] so dateline-
    crossing edges take the short way around."""
    lam = np.radians(xs)
    phi = np.radians(ys)
    dlam = np.roll(lam, -1) - lam
    dlam = np.mod(dlam + np.pi, 2.0 * np.pi) - np.pi
    s = float(np.sum(dlam * (2.0 + np.sin(phi) + np.sin(np.roll(phi, -1)))))
    return -0.5 * EARTH_RADIUS_M * EARTH_RADIUS_M * s


def spherical_rings_area(xs: np.ndarray, ys: np.ndarray, offsets=None) -> float:
    """Even-odd region spherical area (m²): Σ signed ring areas (CCW outer
    positive, CW hole negative) — the ST_Area(geography) analog, mirroring
    rings_area's single-ring |area| back-compat."""
    rings = rings_of(xs, ys, offsets)
    if len(rings) == 1:
        return abs(spherical_ring_area(rings[0][0], rings[0][1]))
    return float(sum(spherical_ring_area(rx, ry) for rx, ry in rings))


def rings_bbox(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
    return bbox(xs, ys)  # bbox over the concatenation == bbox over all rings


def points_in_rings(px: np.ndarray, py: np.ndarray, xs: np.ndarray,
                    ys: np.ndarray, offsets=None) -> np.ndarray:
    """Even-odd PIP over a multi-ring region: XOR of per-ring crossing
    parities — holes and disjoint parts come for free, no orientation
    needed. Replaces ST_Contains on holed/multi geometries
    (spandex/spatialtoolz.py::tag delegates these to PostGIS natively)."""
    rings = rings_of(np.asarray(xs, np.float64), np.asarray(ys, np.float64), offsets)
    if len(rings) == 1:
        return points_in_polygon(px, py, rings[0][0], rings[0][1])
    inside = np.zeros(np.asarray(px).shape[0], dtype=bool)
    for rx, ry in rings:
        inside ^= points_in_polygon(px, py, rx, ry)
    return inside


def rings_centroid(xs: np.ndarray, ys: np.ndarray, offsets=None) -> tuple[float, float]:
    """Area centroid of the even-odd region (signed-area weighted per ring);
    falls back to the single-ring centroid for simple polygons."""
    rings = rings_of(xs, ys, offsets)
    if len(rings) == 1:
        return centroid(rings[0][0], rings[0][1])
    a_tot = 0.0
    cx_tot = 0.0
    cy_tot = 0.0
    for rx, ry in rings:
        x2 = np.roll(rx, -1)
        y2 = np.roll(ry, -1)
        cross = rx * y2 - x2 * ry
        a = 0.5 * float(np.sum(cross))
        if abs(a) < 1e-300:
            continue
        cx_tot += float(np.sum((rx + x2) * cross)) / 6.0
        cy_tot += float(np.sum((ry + y2) * cross)) / 6.0
        a_tot += a
    if abs(a_tot) < 1e-300:
        return float(xs.mean()), float(ys.mean())
    return cx_tot / a_tot, cy_tot / a_tot


def rings_intersection_area(xs1: np.ndarray, ys1: np.ndarray, off1,
                            xs2: np.ndarray, ys2: np.ndarray, off2=None) -> float:
    """Exact intersection area of two even-odd multi-ring regions by
    inclusion-exclusion: with ring indicators 1_A = Σ_i s_i·1_ring_i (s from
    orientation; valid nesting), area(A∩B) = Σ_ij s_i·s_j·area(ring_i∩ring_j).
    Each pairwise term uses the simple-polygon kernel. Replaces
    ST_Area(ST_Intersection(...)) for holed/multipart layers
    (spandex/spatialtoolz.py::proportion_overlap)."""
    r1 = rings_of(xs1, ys1, off1)
    r2 = rings_of(xs2, ys2, off2)
    if len(r1) == 1 and len(r2) == 1:
        return polygon_intersection_area(r1[0][0], r1[0][1], r2[0][0], r2[0][1])
    total = 0.0
    for ax, ay in r1:
        s1 = 1.0 if len(r1) == 1 or shoelace_area(ax, ay) >= 0 else -1.0
        for bx, by in r2:
            s2 = 1.0 if len(r2) == 1 or shoelace_area(bx, by) >= 0 else -1.0
            ix = polygon_intersection_area(ax, ay, bx, by)
            if ix:
                total += s1 * s2 * ix
    return max(0.0, total)


def rings_are_valid(xs: np.ndarray, ys: np.ndarray, offsets=None) -> bool:
    """Multi-ring ST_IsValid analog: every ring simple (polygon_is_valid),
    no two rings' edges cross, and every CW (hole) ring's first vertex
    inside the union of CCW rings."""
    rings = rings_of(xs, ys, offsets)
    if len(rings) == 1:
        return polygon_is_valid(rings[0][0], rings[0][1])
    for rx, ry in rings:
        if not polygon_is_valid(rx, ry):
            return False
    # cross-ring edge intersections
    for a in range(len(rings)):
        ax, ay = rings[a]
        ax2, ay2 = np.roll(ax, -1), np.roll(ay, -1)
        for b in range(a + 1, len(rings)):
            bx, by = rings[b]
            bx2, by2 = np.roll(bx, -1), np.roll(by, -1)
            for i in range(ax.shape[0]):
                for j in range(bx.shape[0]):
                    if _segments_cross(ax[i], ay[i], ax2[i], ay2[i],
                                       bx[j], by[j], bx2[j], by2[j]):
                        return False
    outers = [(rx, ry) for rx, ry in rings if shoelace_area(rx, ry) >= 0]
    for rx, ry in rings:
        if shoelace_area(rx, ry) < 0:  # hole: must sit inside some outer
            p = np.array([rx[0]]), np.array([ry[0]])
            if not any(points_in_polygon(p[0], p[1], ox, oy)[0]
                       or _on_boundary(rx[0], ry[0], ox, oy)
                       for ox, oy in outers):
                return False
    return True


def _on_boundary(px: float, py: float, xs: np.ndarray, ys: np.ndarray,
                 eps: float = 1e-12) -> bool:
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    vx, vy = x2 - xs, y2 - ys
    wx, wy = px - xs, py - ys
    seg_len2 = vx * vx + vy * vy
    t = np.clip(np.where(seg_len2 > 0, (wx * vx + wy * vy) / np.where(seg_len2 > 0, seg_len2, 1.0), 0.0), 0.0, 1.0)
    dx = wx - t * vx
    dy = wy - t * vy
    return bool(np.any(dx * dx + dy * dy <= eps * eps))


# ---------------------------------------------------------------- PIP

def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (ray-cast) point-in-polygon.

    Half-open edge treatment: an edge counts when ``y1 <= py < y2`` (either
    direction) and the +x ray crossing is strictly right of the point.
    This yields left/bottom-inclusive, right/top-exclusive semantics on
    axis-aligned rings — the documented boundary rule.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    n = xs.shape[0]
    x2s = np.roll(xs, -1)
    y2s = np.roll(ys, -1)
    for i in range(n):
        x1, y1, x2, y2 = xs[i], ys[i], x2s[i], y2s[i]
        if y1 == y2:
            continue
        cond = ((y1 <= py) & (py < y2)) | ((y2 <= py) & (py < y1))
        if not cond.any():
            continue
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (px < xint)
    return inside


def pip_pairs(px: np.ndarray, py: np.ndarray, poly_ids: np.ndarray,
              polys: dict) -> np.ndarray:
    """PIP over candidate (point, polygon) pairs: row i tests point i against
    polygon ``polys[poly_ids[i]]`` (value = (xs, ys) or (xs, ys, ring_offsets)
    arrays). Vectorizes per distinct polygon in the batch — the inner loop is
    over polygons, not rows.
    """
    out = np.zeros(px.shape[0], dtype=bool)
    order = np.argsort(poly_ids, kind="stable")
    sorted_ids = poly_ids[order]
    boundaries = np.flatnonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1]])
    boundaries = np.r_[boundaries, sorted_ids.shape[0]]
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        idx = order[b0:b1]
        entry = polys[sorted_ids[b0]]
        xs, ys = entry[0], entry[1]
        offsets = entry[2] if len(entry) > 2 else None
        out[idx] = points_in_rings(px[idx], py[idx], xs, ys, offsets)
    return out


# ---------------------------------------------------------------- distance

def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, vectorized."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


# ---------------------------------------------------------------- linestrings

def linestring_length(xs: np.ndarray, ys: np.ndarray, offsets=None,
                      metric: str = "planar") -> float:
    """Total length of a (multi-)linestring: sum of segment lengths per
    part (parts delimited by ``offsets`` — OPEN parts, no closing segment).
    ``metric``: 'planar' (degrees) or 'haversine' (meters). ST_Length
    analog for the road/network layers the reference stores in PostGIS."""
    total = 0.0
    for rx, ry in rings_of(np.asarray(xs, np.float64),
                           np.asarray(ys, np.float64), offsets):
        if rx.shape[0] < 2:
            continue
        if metric == "haversine":
            seg = haversine_m(rx[:-1], ry[:-1], rx[1:], ry[1:])
        else:
            seg = np.hypot(rx[1:] - rx[:-1], ry[1:] - ry[:-1])
        total += float(seg.sum())
    return total


def points_to_linestring_dist(px: np.ndarray, py: np.ndarray,
                              xs: np.ndarray, ys: np.ndarray,
                              offsets=None) -> np.ndarray:
    """Planar min distance from each point to a (multi-)linestring:
    vectorized point-to-segment over every part's segments (the `<->`
    operand PostGIS evaluates for line features). Degrees in, degrees out;
    for ground meters callers scale or use small-extent layers."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    best = np.full(px.shape[0], np.inf)
    for rx, ry in rings_of(np.asarray(xs, np.float64),
                           np.asarray(ys, np.float64), offsets):
        for i in range(rx.shape[0] - 1):
            dx, dy = rx[i + 1] - rx[i], ry[i + 1] - ry[i]
            ln = dx * dx + dy * dy
            if ln == 0.0:
                d2 = (px - rx[i]) ** 2 + (py - ry[i]) ** 2
            else:
                t = np.clip(((px - rx[i]) * dx + (py - ry[i]) * dy) / ln, 0.0, 1.0)
                d2 = (rx[i] + t * dx - px) ** 2 + (ry[i] + t * dy - py) ** 2
            np.minimum(best, d2, out=best)
    return np.sqrt(best)


# ---------------------------------------------------------------- clipping

def clip_polygon_convex(sx: np.ndarray, sy: np.ndarray,
                        cx: np.ndarray, cy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman: clip subject ring (sx, sy) by CONVEX CCW clip ring
    (cx, cy). Returns the clipped ring (possibly empty). Open rings."""
    out_x = list(sx)
    out_y = list(sy)
    n = cx.shape[0]
    for i in range(n):
        ex1, ey1 = cx[i], cy[i]
        ex2, ey2 = cx[(i + 1) % n], cy[(i + 1) % n]
        in_x, in_y = out_x, out_y
        out_x, out_y = [], []
        m = len(in_x)
        if m == 0:
            break
        # signed side of each vertex relative to clip edge (CCW: left = inside)
        for j in range(m):
            px1, py1 = in_x[j - 1], in_y[j - 1]
            px2, py2 = in_x[j], in_y[j]
            d1 = (ex2 - ex1) * (py1 - ey1) - (ey2 - ey1) * (px1 - ex1)
            d2 = (ex2 - ex1) * (py2 - ey1) - (ey2 - ey1) * (px2 - ex1)
            if d2 >= 0.0:
                if d1 < 0.0:
                    t = d1 / (d1 - d2)
                    out_x.append(px1 + t * (px2 - px1))
                    out_y.append(py1 + t * (py2 - py1))
                out_x.append(px2)
                out_y.append(py2)
            elif d1 >= 0.0:
                t = d1 / (d1 - d2)
                out_x.append(px1 + t * (px2 - px1))
                out_y.append(py1 + t * (py2 - py1))
    return np.asarray(out_x, dtype=np.float64), np.asarray(out_y, dtype=np.float64)


def _is_convex_ccw(xs: np.ndarray, ys: np.ndarray) -> bool:
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    x3, y3 = np.roll(xs, -2), np.roll(ys, -2)
    cross = (x2 - xs) * (y3 - y2) - (y2 - ys) * (x3 - x2)
    return bool(np.all(cross >= -1e-12))


def ear_clip_triangulate(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear-clipping triangulation of a simple CCW polygon → index triples."""
    n = xs.shape[0]
    if n < 3:
        return []
    idx = list(range(n))
    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        m = len(idx)
        ear_found = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            ax, ay = xs[i0], ys[i0]
            bx, by = xs[i1], ys[i1]
            cx_, cy_ = xs[i2], ys[i2]
            cross = (bx - ax) * (cy_ - ay) - (by - ay) * (cx_ - ax)
            if cross <= 1e-300:  # reflex or degenerate vertex — not an ear
                continue
            # no other active vertex strictly inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                pxj, pyj = xs[j], ys[j]
                d0 = (bx - ax) * (pyj - ay) - (by - ay) * (pxj - ax)
                d1 = (cx_ - bx) * (pyj - by) - (cy_ - by) * (pxj - bx)
                d2 = (ax - cx_) * (pyj - cy_) - (ay - cy_) * (pxj - cx_)
                # non-strict: a vertex ON the ear boundary blocks it too —
                # a diagonal through a vertex would pinch the remainder
                if d0 >= 0 and d1 >= 0 and d2 >= 0:
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                del idx[k]
                ear_found = True
                break
        if not ear_found:  # numerically stuck — drop the flattest vertex
            flat = min(range(m), key=lambda k: abs(
                (xs[idx[k]] - xs[idx[(k - 1) % m]]) * (ys[idx[(k + 1) % m]] - ys[idx[k]])
                - (ys[idx[k]] - ys[idx[(k - 1) % m]]) * (xs[idx[(k + 1) % m]] - xs[idx[k]])))
            del idx[flat]
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris


def convex_hull(xs: np.ndarray, ys: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Convex hull of a point set (Andrew monotone chain), returned as a
    CCW ring of the STRICT hull vertices (collinear boundary points
    dropped). Degenerate inputs (all collinear) return the 2 extreme
    points; a single point returns itself."""
    pts = np.unique(np.column_stack([xs, ys]), axis=0)  # lex sort + dedup
    n = pts.shape[0]
    if n <= 2:
        return pts[:, 0].copy(), pts[:, 1].copy()

    def chain(p):
        out = []
        for i in range(p.shape[0]):
            while len(out) >= 2:
                ox1, oy1 = out[-2]
                ox2, oy2 = out[-1]
                if ((ox2 - ox1) * (p[i, 1] - oy1)
                        - (oy2 - oy1) * (p[i, 0] - ox1)) <= 0:
                    out.pop()
                else:
                    break
            out.append((p[i, 0], p[i, 1]))
        return out[:-1]  # endpoint belongs to the other chain

    lower = chain(pts)
    upper = chain(pts[::-1])
    ring = lower + upper
    if len(ring) < 3:  # all collinear
        ext = np.array([pts[0], pts[-1]])
        return ext[:, 0].copy(), ext[:, 1].copy()
    arr = np.array(ring)
    return arr[:, 0].copy(), arr[:, 1].copy()


def simplify_chain(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for an OPEN polyline (endpoints always
    kept): drop every vertex within ``tol`` perpendicular distance of the
    local anchor chord. Iterative stack, numpy distance per span."""
    n = xs.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        mx = xs[i + 1:j]
        my = ys[i + 1:j]
        dx, dy = bx - ax, by - ay
        L = np.hypot(dx, dy)
        if L == 0.0:
            d = np.hypot(mx - ax, my - ay)
        else:
            d = np.abs(dx * (my - ay) - dy * (mx - ax)) / L
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_ring(xs: np.ndarray, ys: np.ndarray,
                  tol: float) -> tuple[np.ndarray, np.ndarray]:
    """Douglas-Peucker for a CLOSED ring (open storage): anchor at vertex 0
    and the vertex farthest from it, simplify the two chains, rejoin.
    Returns the kept (xs, ys); may drop below 3 vertices for degenerate
    rings (caller decides whether to discard)."""
    n = xs.shape[0]
    if n <= 2:
        return xs, ys
    m = int(np.argmax(np.hypot(xs - xs[0], ys - ys[0])))
    if m == 0:
        return xs[:1], ys[:1]  # all vertices coincide
    cx = np.concatenate([xs[m:], xs[:1]])
    cy = np.concatenate([ys[m:], ys[:1]])
    k1 = simplify_chain(xs[:m + 1], ys[:m + 1], tol)
    k2 = simplify_chain(cx, cy, tol)
    keep = np.zeros(n, dtype=bool)
    keep[:m + 1] = k1
    keep[m:] |= k2[:-1]
    keep[0] |= k2[-1]
    return xs[keep], ys[keep]


def dissolve_rings(rings: list, quant: float = 1e-9) -> list:
    """Merge a tiling of non-overlapping rings (shared edges traversed once
    in EACH direction, e.g. trim's triangle-tiled clip output) into its
    minimal boundary rings.

    Directed-edge cancellation: every interior edge of the tiling appears
    once as (a→b) and once as (b→a) — delete matched opposite pairs (vertex
    keys quantized to ``quant`` degrees to absorb FP differences between
    the two triangles' clip arithmetic); the surviving directed edges are
    exactly the region boundary, chained back into rings and stripped of
    straight-through collinear vertices. Orientation survives (outer CCW,
    holes CW), so even-odd semantics and area are preserved identically.
    At a pinch vertex (two boundary loops touching) chaining picks an
    arbitrary continuation — the edge SET, hence region and area, is
    still exact."""
    def qk(x: float, y: float):
        return (round(x / quant), round(y / quant))

    edges: dict = {}
    for rx, ry in rings:
        n = rx.shape[0]
        for i in range(n):
            j = (i + 1) % n
            a, b = qk(rx[i], ry[i]), qk(rx[j], ry[j])
            if a == b:
                continue
            edges.setdefault((a, b), []).append((float(rx[i]), float(ry[i])))
    for a, b in list(edges.keys()):
        if a < b and (b, a) in edges:
            k = min(len(edges[(a, b)]), len(edges[(b, a)]))
            for key in ((a, b), (b, a)):
                del edges[key][:k]
                if not edges[key]:
                    del edges[key]
    succ: dict = {}
    for (a, b), pts in edges.items():
        for p in pts:
            succ.setdefault(a, []).append((b, p))
    out: list = []
    while succ:
        start = next(iter(succ))
        cur = start
        pts: list = []
        while True:
            nxt, p = succ[cur].pop()
            if not succ[cur]:
                del succ[cur]
            pts.append(p)
            cur = nxt
            if cur == start or cur not in succ:
                break
        if len(pts) < 3:
            continue
        px = np.array([p[0] for p in pts])
        py = np.array([p[1] for p in pts])
        # strip straight-through collinear vertices (triangulation-diagonal
        # endpoints that landed on a boundary edge)
        keep = np.ones(px.shape[0], bool)
        m = px.shape[0]
        for i in range(m):
            h, j = (i - 1) % m, (i + 1) % m
            cross = ((px[i] - px[h]) * (py[j] - py[i])
                     - (py[i] - py[h]) * (px[j] - px[i]))
            dot = ((px[i] - px[h]) * (px[j] - px[i])
                   + (py[i] - py[h]) * (py[j] - py[i]))
            scale = max(abs(px[i]) + abs(py[i]), 1.0)
            if abs(cross) <= 1e-12 * scale and dot > 0:
                keep[i] = False
        if keep.sum() >= 3:
            px, py = px[keep], py[keep]
        out.append((px, py))
    return out


def _normalize_polys(polys: list) -> list:
    return [(np.asarray(xs, np.float64), np.asarray(ys, np.float64),
             (np.asarray(o, np.int64) if o is not None and len(o) > 2
              else None)) for xs, ys, o in polys]


def _any_cover(polys: list, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """True where (px, py) is inside >= 1 of the even-odd polygons."""
    covered = np.zeros(px.shape[0], dtype=bool)
    for xs, ys, offs in polys:
        todo = ~covered
        if not todo.any():
            break
        covered[todo] |= points_in_rings(px[todo], py[todo], xs, ys, offs)
    return covered


def union_rings(polys: list, quant: float = 1e-9, eps_off: float = None) -> list:
    """General polygon union — OVERLAPPING inputs allowed (the ST_Union
    semantics dissolve_rings can't give; spandex's spatialtoolz templates
    delegate this to PostGIS). See _arrangement_region for the
    construction; membership = covered by >= 1 input polygon."""
    polys = _normalize_polys(polys)
    return _arrangement_region(polys, lambda px, py: _any_cover(polys, px, py),
                               quant=quant, eps_off=eps_off)


def boolean_rings(polys_a: list, polys_b: list, op: str,
                  quant: float = 1e-9, eps_off: float = None) -> list:
    """General polygon boolean ops on two groups of even-odd polygons —
    the ST_Intersection / ST_Difference / ST_SymDifference GEOMETRY
    analogs (trim covers only the convex/triangulated clip-area case).
    Region semantics: A = union of polys_a, B = union of polys_b;
    ``op`` in {'union', 'intersection', 'difference', 'symdiff'}.
    Same arrangement machinery and tolerance contract as union_rings."""
    polys_a = _normalize_polys(polys_a)
    polys_b = _normalize_polys(polys_b)
    try:
        combine = {"union": lambda a, b: a | b,
                   "intersection": lambda a, b: a & b,
                   "difference": lambda a, b: a & ~b,
                   "symdiff": lambda a, b: a ^ b}[op]
    except KeyError:
        raise ValueError(f"unknown op {op!r}") from None

    def member(px, py):
        return combine(_any_cover(polys_a, px, py), _any_cover(polys_b, px, py))

    return _arrangement_region(polys_a + polys_b, member,
                               quant=quant, eps_off=eps_off)


def arrangement_faces(polys: list, segments=None, quant: float = 1e-9,
                      eps_off: float = None) -> list:
    """All BOUNDED faces of the planar arrangement of ring edges plus
    bare ``segments`` — the face-walk complement of _arrangement_region
    (which extracts one region's boundary).  This is the kernel behind
    ST_Split (faces of polygon ∪ cut lines) and vector polygonize
    (GEOS Polygonizer: faces of fully-noded linework).

    ``segments``: optional (ax, ay, bx, by) float arrays of bare
    (unclosed) edges.  Machinery: the same noding + snapping as the
    boolean kernel, then BOTH directions of every surviving sub-edge
    enter the clockwise-most-turn walk, so every directed edge is used
    exactly once and the cycles partition the plane: bounded faces come
    out CCW (kept), each component's outer face comes out CW (dropped
    by the area sign).  Dangling edges (a cut that doesn't separate —
    GEOS calls them dangles) appear as zero-width spurs on their face's
    ring and are removed by the spike-strip pass, matching Polygonizer,
    which ignores dangles.  Returns a list of CCW (xs, ys) rings; holes
    are NOT nested (every atomic face is its own simple ring).
    """
    ring_e = _ring_edges(_normalize_polys(polys)) if polys else \
        (None, None, None, None)
    parts = [e for e in [ring_e if ring_e[0] is not None else None]
             if e is not None]
    if segments is not None and len(segments[0]):
        parts.append(tuple(np.asarray(a, np.float64) for a in segments))
    if not parts:
        return []
    ax = np.concatenate([p[0] for p in parts])
    ay = np.concatenate([p[1] for p in parts])
    bx = np.concatenate([p[2] for p in parts])
    by = np.concatenate([p[3] for p in parts])
    nz = (ax != bx) | (ay != by)
    ax, ay, bx, by = ax[nz], ay[nz], bx[nz], by[nz]
    if ax.shape[0] == 0:
        return []
    keys, _ = _noded_subedges(ax, ay, bx, by, quant, eps_off)
    if not keys:
        return []
    fa_x = np.array([k[0][0] for k in keys] + [k[1][0] for k in keys])
    fa_y = np.array([k[0][1] for k in keys] + [k[1][1] for k in keys])
    fb_x = np.array([k[1][0] for k in keys] + [k[0][0] for k in keys])
    fb_y = np.array([k[1][1] for k in keys] + [k[0][1] for k in keys])
    out = []
    for px, py in _assemble_cycles(fa_x, fa_y, fb_x, fb_y):
        px, py = _strip_spikes(px, py)
        if px.shape[0] >= 3 and shoelace_area(px, py) > 0.0:
            out.append((px, py))
    return out


def _strip_spikes(px: np.ndarray, py: np.ndarray):
    """Remove zero-width spurs (…, P, Q, P, … → …, P, …) until stable —
    the dangling-edge residue of the face walk."""
    pts = list(zip(px.tolist(), py.tolist()))
    changed = True
    while changed and len(pts) >= 3:
        changed = False
        n = len(pts)
        for i in range(n):
            if pts[(i - 1) % n] == pts[(i + 1) % n]:
                # drop the spike tip and the duplicated return vertex
                for j in sorted(((i, (i + 1) % n)), reverse=True):
                    pts.pop(j)
                changed = True
                break
    return (np.array([p[0] for p in pts], np.float64),
            np.array([p[1] for p in pts], np.float64))


def _arrangement_region(polys: list, member, quant: float = 1e-9,
                        eps_off: float = None) -> list:
    """Planar-arrangement region extraction, from scratch:

    1. every edge of every input ring is split at its intersections with
       every other edge (non-parallel crossings AND collinear-overlap
       endpoints), endpoints quantized to ``quant`` so coincident vertices
       merge exactly;
    2. coincident duplicate sub-edges collapse to one (shared borders,
       stacked polygons);
    3. each surviving sub-edge is classified by REGION MEMBERSHIP
       (``member(px, py) -> bool`` — union coverage, intersection, ...)
       of the two points offset ``eps_off`` to its left and right: kept
       iff exactly one side is in the region, oriented region-on-LEFT;
    4. rings are assembled by the clockwise-most-turn rule (at a vertex,
       continue along the unused edge with the smallest clockwise rotation
       from the reversed incoming direction) — pinch vertices split into
       separate simple rings instead of figure-eights, outer rings come
       out CCW and holes CW, so rings_area/points_in_rings work unchanged.

    ``polys``: list of (xs, ys, ring_offsets-or-None) — the edge sources
    (already normalized). Returns a list of oriented (xs, ys) rings.
    Tolerance contract: distinct non-coincident boundaries closer than
    ``eps_off`` (default 1e-7 x the bbox diagonal) may misclassify —
    inputs at that separation should be snapped first.
    """
    ax, ay, bx, by = _ring_edges(polys)
    if ax is None:
        return []
    keys, eps_off = _noded_subedges(ax, ay, bx, by, quant, eps_off)
    if not keys:
        return []
    sax = np.array([k[0][0] for k in keys]); say = np.array([k[0][1] for k in keys])
    sbx = np.array([k[1][0] for k in keys]); sby = np.array([k[1][1] for k in keys])

    # -- 3. membership classification at midpoint +/- eps_off * left normal
    mx, my = (sax + sbx) / 2.0, (say + sby) / 2.0
    dx, dy = sbx - sax, sby - say
    ln = np.hypot(dx, dy)
    nx_, ny_ = -dy / ln, dx / ln
    probe_x = np.concatenate([mx + eps_off * nx_, mx - eps_off * nx_])
    probe_y = np.concatenate([my + eps_off * ny_, my - eps_off * ny_])
    covered = member(probe_x, probe_y)
    k = len(keys)
    left_cov, right_cov = covered[:k], covered[k:]
    keep = left_cov != right_cov
    # orient interior-left
    fa_x = np.where(right_cov[keep], sbx[keep], sax[keep])
    fa_y = np.where(right_cov[keep], sby[keep], say[keep])
    fb_x = np.where(right_cov[keep], sax[keep], sbx[keep])
    fb_y = np.where(right_cov[keep], say[keep], sby[keep])
    return _assemble_cycles(fa_x, fa_y, fb_x, fb_y)


def _ring_edges(polys: list):
    """Directed edge arrays from ring sources, zero-length edges
    dropped; (None,)*4 when no ring has 3+ vertices."""
    ax, ay, bx, by = [], [], [], []
    for xs, ys, offs in polys:
        for rx, ry in rings_of(xs, ys, offs):
            n = rx.shape[0]
            if n < 3:
                continue
            jj = np.roll(np.arange(n), -1)
            keep = (rx != rx[jj]) | (ry != ry[jj])
            ax.append(rx[keep]); ay.append(ry[keep])
            bx.append(rx[jj][keep]); by.append(ry[jj][keep])
    if not ax:
        return None, None, None, None
    return (np.concatenate(ax), np.concatenate(ay),
            np.concatenate(bx), np.concatenate(by))


def _noded_subedges(ax, ay, bx, by, quant: float, eps_off: float):
    """Arrangement parts 1–2 (see _arrangement_region): split every
    edge at every crossing / collinear-overlap endpoint, snap to
    ``quant``, collapse coincident duplicates.  Returns (keys,
    eps_off): keys are ((x,y),(x,y)) sub-edges in their original
    orientation; eps_off is resolved from the bbox diagonal when None.
    """
    m = ax.shape[0]
    rx_, ry_ = bx - ax, by - ay
    seg_len = np.hypot(rx_, ry_)
    diag = np.hypot(max(ax.max(), bx.max()) - min(ax.min(), bx.min()),
                    max(ay.max(), by.max()) - min(ay.min(), by.min()))
    if eps_off is None:
        eps_off = 1e-7 * max(diag, 1.0)
    tol = 1e-12

    # -- 1. split parameters per edge: blocked (B x m) matrix passes —
    # O(m^2) arithmetic stays in numpy (a per-edge Python loop was the
    # arrangement's hot spot); only the SPARSE hit lists surface to Python
    splits: list = [[] for _ in range(m)]
    L2_all = rx_ * rx_ + ry_ * ry_
    BLK = 256
    for s0 in range(0, m, BLK):
        blk = slice(s0, min(s0 + BLK, m))
        qpx = ax[None, :] - ax[blk, None]          # start_j - start_i
        qpy = ay[None, :] - ay[blk, None]
        denom = (rx_[blk, None] * ry_[None, :]
                 - ry_[blk, None] * rx_[None, :])  # cross(r_i, s_j)
        cross_qr = qpx * ry_[blk, None] - qpy * rx_[blk, None]  # cross(qp, r_i)
        par = np.abs(denom) <= tol * seg_len[blk, None] * seg_len[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(par, np.nan,
                         (qpx * ry_[None, :] - qpy * rx_[None, :]) / denom)
            u = np.where(par, np.nan, cross_qr / denom)
        hit = (~par & (u >= -tol) & (u <= 1.0 + tol)
               & (t > tol) & (t < 1.0 - tol))
        for bi, bj in zip(*np.nonzero(hit)):
            splits[s0 + bi].append(float(t[bi, bj]))
        col = par & (np.abs(cross_qr) <= 1e-9 * seg_len[blk, None]
                     * np.maximum(np.hypot(qpx, qpy), 1.0))
        ci, cj = np.nonzero(col)
        if ci.size:
            # collinear is cheap to TRIGGER (every pair of edges on one
            # gridline matches, however far apart) — project vectorized
            # and surface only endpoints landing strictly inside (0, 1)
            gi = s0 + ci
            t0v = (qpx[ci, cj] * rx_[gi] + qpy[ci, cj] * ry_[gi]) / L2_all[gi]
            t1v = t0v + (rx_[cj] * rx_[gi] + ry_[cj] * ry_[gi]) / L2_all[gi]
            for tv_arr in (t0v, t1v):
                inside = (tv_arr > tol) & (tv_arr < 1.0 - tol)
                for i, tv in zip(gi[inside], tv_arr[inside]):
                    splits[i].append(float(tv))

    def snap(x: float, y: float):
        return (round(x / quant) * quant, round(y / quant) * quant)

    # -- 2. materialize sub-edges, dedupe coincident duplicates
    sub: dict = {}
    for i in range(m):
        ts = sorted(set([0.0, 1.0] + splits[i]))
        pts = [snap(ax[i] + t * rx_[i], ay[i] + t * ry_[i]) for t in ts]
        for a, b in zip(pts, pts[1:]):
            if a == b:
                continue
            sub.setdefault((a, b) if a < b else (b, a), (a, b))
    return list(sub.values()), eps_off


def _assemble_cycles(fa_x, fa_y, fb_x, fb_y) -> list:
    """Arrangement part 4 (see _arrangement_region): clockwise-most-turn
    cycle assembly over directed (a → b) point pairs; straight-through
    collinear vertices stripped from each emitted ring."""
    tol = 1e-12
    outgoing: dict = {}
    for i in range(fa_x.shape[0]):
        a = (fa_x[i], fa_y[i]); b = (fb_x[i], fb_y[i])
        outgoing.setdefault(a, []).append([b, False])  # [target, used]
    out = []
    for start in list(outgoing):
        for slot in outgoing[start]:
            if slot[1]:
                continue
            slot[1] = True
            ring = [start, slot[0]]
            while True:
                u, v = ring[-2], ring[-1]
                if v == ring[0] and len(ring) > 3:
                    ring.pop()
                    break
                cands = [s for s in outgoing.get(v, []) if not s[1]]
                if not cands:
                    ring = None  # open chain — numerical orphan, drop
                    break
                th_in = np.arctan2(u[1] - v[1], u[0] - v[0])  # reversed inc.
                best, best_ang = None, None
                for s in cands:
                    th = np.arctan2(s[0][1] - v[1], s[0][0] - v[0])
                    angcw = (th_in - th) % (2.0 * np.pi)
                    if angcw <= tol:
                        angcw = 2.0 * np.pi  # exact backtrack = last resort
                    if best_ang is None or angcw < best_ang:
                        best, best_ang = s, angcw
                best[1] = True
                ring.append(best[0])
            if ring is None or len(ring) < 3:
                continue
            px = np.array([p[0] for p in ring])
            py = np.array([p[1] for p in ring])
            # strip straight-through collinear vertices added by splitting
            nr = px.shape[0]
            keepv = np.ones(nr, bool)
            for i2 in range(nr):
                h, j2 = (i2 - 1) % nr, (i2 + 1) % nr
                crossv = ((px[i2] - px[h]) * (py[j2] - py[i2])
                          - (py[i2] - py[h]) * (px[j2] - px[i2]))
                dotv = ((px[i2] - px[h]) * (px[j2] - px[i2])
                        + (py[i2] - py[h]) * (py[j2] - py[i2]))
                scale = max(abs(px[i2]) + abs(py[i2]), 1.0)
                if abs(crossv) <= 1e-12 * scale and dotv > 0:
                    keepv[i2] = False
            if keepv.sum() >= 3:
                px, py = px[keepv], py[keepv]
            out.append((px, py))
    return out


def polygon_intersection_area(xs1: np.ndarray, ys1: np.ndarray,
                              xs2: np.ndarray, ys2: np.ndarray) -> float:
    """Exact intersection area of two simple polygons.

    Fast paths: axis-aligned-rectangle pair (pure arithmetic — the dominant
    case for grid zone layers), then convex clip ring. General case:
    ear-clip each into triangles, Sutherland–Hodgman each triangle pair,
    sum shoelace areas. O(T1*T2) per pair — fine at parcel vertex counts.
    """
    if _is_axis_rect(xs1, ys1) and _is_axis_rect(xs2, ys2):
        w = min(xs1.max(), xs2.max()) - max(xs1.min(), xs2.min())
        h = min(ys1.max(), ys2.max()) - max(ys1.min(), ys2.min())
        return float(max(0.0, w) * max(0.0, h))
    if shoelace_area(xs1, ys1) < 0:
        xs1, ys1 = xs1[::-1].copy(), ys1[::-1].copy()
    if shoelace_area(xs2, ys2) < 0:
        xs2, ys2 = xs2[::-1].copy(), ys2[::-1].copy()
    if _is_convex_ccw(xs2, ys2):
        cx_, cy_ = clip_polygon_convex(xs1, ys1, xs2, ys2)
        return abs(shoelace_area(cx_, cy_)) if cx_.shape[0] >= 3 else 0.0
    if _is_convex_ccw(xs1, ys1):
        cx_, cy_ = clip_polygon_convex(xs2, ys2, xs1, ys1)
        return abs(shoelace_area(cx_, cy_)) if cx_.shape[0] >= 3 else 0.0
    total = 0.0
    tris2 = ear_clip_triangulate(xs2, ys2)
    for (a, b, c) in ear_clip_triangulate(xs1, ys1):
        t1x = np.array([xs1[a], xs1[b], xs1[c]])
        t1y = np.array([ys1[a], ys1[b], ys1[c]])
        for (d, e, f) in tris2:
            t2x = np.array([xs2[d], xs2[e], xs2[f]])
            t2y = np.array([ys2[d], ys2[e], ys2[f]])
            cxp, cyp = clip_polygon_convex(t1x, t1y, t2x, t2y)
            if cxp.shape[0] >= 3:
                total += abs(shoelace_area(cxp, cyp))
    return total


def _is_axis_rect(xs: np.ndarray, ys: np.ndarray) -> bool:
    if xs.shape[0] != 4:
        return False
    return (np.unique(xs).shape[0] == 2 and np.unique(ys).shape[0] == 2
            and abs(abs(shoelace_area(xs, ys))
                    - (xs.max() - xs.min()) * (ys.max() - ys.min())) < 1e-12)


# ---------------------------------------------------------------- validation

def polygon_is_valid(xs: np.ndarray, ys: np.ndarray) -> bool:
    """ST_IsValid analog (spandex/spatialtoolz.py::invalid_geometry_check):
    >=3 distinct vertices, nonzero area, no self-intersection (O(n^2) sweep
    over non-adjacent segment pairs)."""
    n = xs.shape[0]
    if n < 3:
        return False
    if np.unique(np.stack([xs, ys], axis=1), axis=0).shape[0] < 3:
        return False
    if abs(shoelace_area(xs, ys)) < 1e-300:
        return False
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            if _segments_cross(xs[i], ys[i], x2[i], y2[i], xs[j], ys[j], x2[j], y2[j]):
                return False
    return True


def _segments_cross(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    return (d1 * d2 < 0) and (d3 * d4 < 0)


# ---------------------------------------------------------------- reprojection

def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857, analytic (ST_Transform analog,
    spandex/spatialtoolz.py::reproject). Vectorized numpy."""
    R = 6_378_137.0
    x = R * np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    R = 6_378_137.0
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - np.pi / 2.0)
    return lon, lat


# WGS84 ellipsoid + UTM constants (public: Snyder 1987, USGS PP 1395)
_WGS84_A = 6_378_137.0
_WGS84_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_FE = 500_000.0
_UTM_FN_S = 10_000_000.0


def lonlat_to_utm(lon: np.ndarray, lat: np.ndarray, zone: int,
                  north: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → UTM zone (EPSG:326xx north / 327xx south), vectorized
    transverse-Mercator series (Snyder 1987 eqs 8-9..8-13; mm-accurate in
    zone). Extends spandex/spatialtoolz.py::conform_srids beyond 3857 — the
    reference targets an arbitrary project SRID via ST_Transform, and UTM
    is the SRID family its parcel data actually uses."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    a, f = _WGS84_A, _WGS84_F
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    lam0 = np.radians(float(zone) * 6.0 - 183.0)
    phi = np.radians(lat)
    lam = np.radians(lon)
    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    tan_phi = np.tan(phi)
    N = a / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
    T = tan_phi * tan_phi
    C = ep2 * cos_phi * cos_phi
    A = cos_phi * (lam - lam0)
    M = a * ((1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 ** 3 / 256.0) * phi
             - (3.0 * e2 / 8.0 + 3.0 * e2 * e2 / 32.0 + 45.0 * e2 ** 3 / 1024.0) * np.sin(2.0 * phi)
             + (15.0 * e2 * e2 / 256.0 + 45.0 * e2 ** 3 / 1024.0) * np.sin(4.0 * phi)
             - (35.0 * e2 ** 3 / 3072.0) * np.sin(6.0 * phi))
    A2 = A * A
    x = _UTM_K0 * N * (A + (1.0 - T + C) * A2 * A / 6.0
                       + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * ep2)
                       * A2 * A2 * A / 120.0) + _UTM_FE
    y = _UTM_K0 * (M + N * tan_phi * (A2 / 2.0
                                      + (5.0 - T + 9.0 * C + 4.0 * C * C) * A2 * A2 / 24.0
                                      + (61.0 - 58.0 * T + T * T + 600.0 * C
                                         - 330.0 * ep2) * A2 * A2 * A2 / 720.0))
    if not north:
        y = y + _UTM_FN_S
    return x, y


def utm_to_lonlat(x: np.ndarray, y: np.ndarray, zone: int,
                  north: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Inverse UTM (Snyder 1987 eqs 8-17..8-25), vectorized."""
    x = np.asarray(x, np.float64) - _UTM_FE
    y = np.asarray(y, np.float64)
    if not north:
        y = y - _UTM_FN_S
    a, f = _WGS84_A, _WGS84_F
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    lam0 = np.radians(float(zone) * 6.0 - 183.0)
    M = y / _UTM_K0
    mu = M / (a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 ** 3 / 256.0))
    e1 = (1.0 - np.sqrt(1.0 - e2)) / (1.0 + np.sqrt(1.0 - e2))
    phi1 = (mu + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1 * e1 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
            + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu))
    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    C1 = ep2 * cos1 * cos1
    T1 = tan1 * tan1
    N1 = a / np.sqrt(1.0 - e2 * sin1 * sin1)
    R1 = a * (1.0 - e2) / (1.0 - e2 * sin1 * sin1) ** 1.5
    D = x / (N1 * _UTM_K0)
    D2 = D * D
    phi = phi1 - (N1 * tan1 / R1) * (
        D2 / 2.0 - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - 9.0 * ep2)
        * D2 * D2 / 24.0
        + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 * T1 - 252.0 * ep2
           - 3.0 * C1 * C1) * D2 * D2 * D2 / 720.0)
    lam = lam0 + (D - (1.0 + 2.0 * T1 + C1) * D2 * D / 6.0
                  + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * ep2
                     + 24.0 * T1 * T1) * D2 * D2 * D / 120.0) / cos1
    return np.degrees(lam), np.degrees(phi)


# GRS80 (NAD83 / RGF93 state-plane & national LCC grids)
_GRS80_A = 6_378_137.0
_GRS80_F = 1.0 / 298.257222101


def _lcc_consts(phi1_deg: float, phi2_deg: float, phi0_deg: float,
                a: float, f: float):
    """Snyder 1987 eqs 15-1..15-3: the 2SP Lambert Conformal Conic cone
    constant n, scale F, and origin radius rho0 on an ellipsoid."""
    e = np.sqrt(f * (2.0 - f))

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)

    def t(phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4.0 - phi / 2.0)
                / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))

    p1, p2, p0 = np.radians([phi1_deg, phi2_deg, phi0_deg])
    m1, m2 = m(p1), m(p2)
    t1, t2, t0 = t(p1), t(p2), t(p0)
    if abs(phi1_deg - phi2_deg) < 1e-12:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    Fc = m1 / (n * t1 ** n)
    rho0 = a * Fc * t0 ** n
    return e, n, Fc, rho0


def lonlat_to_lcc(lon: np.ndarray, lat: np.ndarray, *, phi1: float,
                  phi2: float, phi0: float, lam0: float, fe: float,
                  fn: float, a: float = _GRS80_A,
                  f: float = _GRS80_F) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → Lambert Conformal Conic 2SP (Snyder 1987 §15, eqs
    15-1..15-7) — the projection family behind US state-plane zones
    (NAD83, e.g. EPSG:26943 California zone 3) and national grids
    (EPSG:2154 Lambert-93, EPSG:3347 Statistics Canada). Vectorized;
    mm-accurate within a zone's validity window."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    e, n, Fc, rho0 = _lcc_consts(phi1, phi2, phi0, a, f)
    phi = np.radians(lat)
    s = np.sin(phi)
    t = (np.tan(np.pi / 4.0 - phi / 2.0)
         / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
    rho = a * Fc * t ** n
    th = n * (np.radians(lon) - np.radians(lam0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_to_lonlat(x: np.ndarray, y: np.ndarray, *, phi1: float, phi2: float,
                  phi0: float, lam0: float, fe: float, fn: float,
                  a: float = _GRS80_A, f: float = _GRS80_F,
                  iters: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """LCC 2SP → EPSG:4326 (Snyder 1987 eqs 15-9..15-11 inverse with the
    standard fixed-point iteration for phi — converges to double precision
    in <= 6 rounds everywhere the forward map is defined)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    e, n, Fc, rho0 = _lcc_consts(phi1, phi2, phi0, a, f)
    dx = x - fe
    dy = rho0 - (y - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    t = (rho / (a * Fc)) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(phi)
        phi = (np.pi / 2.0
               - 2.0 * np.arctan(t * ((1.0 - e * s) / (1.0 + e * s))
                                 ** (e / 2.0)))
    return np.degrees(th / n + np.radians(lam0)), np.degrees(phi)


# Defining constants (EPSG registry, public) for supported meter-unit LCC
# CRSs: (phi1, phi2, phi0, lam0, false_easting, false_northing)
LCC_ZONES = {
    26941: (41.0 + 40.0 / 60, 40.0, 39.0 + 20.0 / 60, -122.0, 2_000_000.0, 500_000.0),   # NAD83 / California zone 1
    26942: (39.0 + 50.0 / 60, 38.0 + 20.0 / 60, 37.0 + 40.0 / 60, -122.0, 2_000_000.0, 500_000.0),  # zone 2
    26943: (38.0 + 26.0 / 60, 37.0 + 4.0 / 60, 36.5, -120.5, 2_000_000.0, 500_000.0),    # zone 3
    26944: (37.0 + 15.0 / 60, 36.0, 35.0 + 20.0 / 60, -119.0, 2_000_000.0, 500_000.0),   # zone 4
    26945: (35.0 + 28.0 / 60, 34.0 + 2.0 / 60, 33.5, -118.0, 2_000_000.0, 500_000.0),    # zone 5
    26946: (33.0 + 53.0 / 60, 32.0 + 47.0 / 60, 32.0 + 10.0 / 60, -116.25, 2_000_000.0, 500_000.0),  # zone 6
    2154: (49.0, 44.0, 46.5, 3.0, 700_000.0, 6_600_000.0),          # RGF93 / Lambert-93
    3347: (49.0, 77.0, 63.390675, -91.0 - 52.0 / 60, 6_200_000.0, 3_000_000.0),  # StatCan LCC
}


def lonlat_to_aeqd(lon: np.ndarray, lat: np.ndarray, lon0: float,
                   lat0: float) -> tuple[np.ndarray, np.ndarray]:
    """Azimuthal equidistant forward (sphere, Snyder 1987 §25
    eq. 25-1..25-4 with k' = c/sin c): meters from the tangent point
    (lon0, lat0), exact distance+azimuth from the center — the local
    frame geodesic buffering projects through."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    l0, p0 = math.radians(lon0), math.radians(lat0)
    dlam = lam - l0
    cosc = (math.sin(p0) * np.sin(phi)
            + math.cos(p0) * np.cos(phi) * np.cos(dlam))
    c = np.arccos(np.clip(cosc, -1.0, 1.0))
    sinc = np.sin(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(sinc > 1e-15, c / np.where(sinc > 1e-15, sinc, 1.0),
                     1.0)
    x = EARTH_RADIUS_M * k * np.cos(phi) * np.sin(dlam)
    y = EARTH_RADIUS_M * k * (math.cos(p0) * np.sin(phi)
                              - math.sin(p0) * np.cos(phi) * np.cos(dlam))
    return x, y


def aeqd_to_lonlat(x: np.ndarray, y: np.ndarray, lon0: float,
                   lat0: float) -> tuple[np.ndarray, np.ndarray]:
    """Azimuthal equidistant inverse (sphere, Snyder §25 eq. 25-15,
    25-16 via atan2): sub-mm round-trips with the forward for features
    well inside a hemisphere."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    l0, p0 = math.radians(lon0), math.radians(lat0)
    rho = np.hypot(x, y)
    c = rho / EARTH_RADIUS_M
    sinc, cosc = np.sin(c), np.cos(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arcsin(np.clip(
            cosc * math.sin(p0)
            + np.where(rho > 0, y * sinc * math.cos(p0)
                       / np.where(rho > 0, rho, 1.0), 0.0), -1.0, 1.0))
    lam = l0 + np.arctan2(
        x * sinc, rho * math.cos(p0) * cosc - y * math.sin(p0) * sinc)
    lon = np.degrees(lam)
    lon = np.where(lon >= 180.0, lon - 360.0,
                   np.where(lon < -180.0, lon + 360.0, lon))
    return lon, np.degrees(phi)


def _albers_q(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - e * e * s * s)
                            - (1.0 / (2.0 * e))
                            * np.log((1.0 - e * s) / (1.0 + e * s)))


def _albers_consts(phi1_deg: float, phi2_deg: float, phi0_deg: float,
                   a: float, f: float):
    """Snyder 1987 eqs 14-3..14-6: Albers Equal-Area Conic 2SP cone
    constant n, C, and origin radius rho0 on an ellipsoid."""
    e = np.sqrt(f * (2.0 - f))
    p1, p2, p0 = np.radians([phi1_deg, phi2_deg, phi0_deg])

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)

    m1, m2 = m(p1), m(p2)
    q1, q2 = _albers_q(p1, e), _albers_q(p2, e)
    if abs(phi1_deg - phi2_deg) < 1e-12:
        n = np.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * _albers_q(p0, e)) / n
    return e, n, C, rho0


def lonlat_to_albers(lon: np.ndarray, lat: np.ndarray, *, phi1: float,
                     phi2: float, phi0: float, lam0: float, fe: float,
                     fn: float, a: float = _GRS80_A,
                     f: float = _GRS80_F) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → Albers Equal-Area Conic 2SP (Snyder 1987 §14) — the
    projection behind the US national grids EPSG:5070 (NAD83 / CONUS
    Albers) and EPSG:3310 (California Albers). Equal-area: the Jacobian
    is exactly 1 against the ellipsoidal area element everywhere."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    e, n, C, rho0 = _albers_consts(phi1, phi2, phi0, a, f)
    q = _albers_q(np.radians(lat), e)
    rho = a * np.sqrt(C - n * q) / n
    th = n * (np.radians(lon) - np.radians(lam0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def albers_to_lonlat(x: np.ndarray, y: np.ndarray, *, phi1: float,
                     phi2: float, phi0: float, lam0: float, fe: float,
                     fn: float, a: float = _GRS80_A, f: float = _GRS80_F,
                     iters: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Albers 2SP → EPSG:4326 (Snyder eqs 14-8..14-11 with eq 3-16's
    fixed-point iteration for phi; double precision in <= 8 rounds)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    e, n, C, rho0 = _albers_consts(phi1, phi2, phi0, a, f)
    dx = x - fe
    dy = rho0 - (y - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    q = (C - (rho * n / a) ** 2) / n
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(phi)
        d = 1.0 - e * e * s * s
        phi = phi + (d * d / (2.0 * np.cos(phi))) * (
            q / (1.0 - e * e) - s / d
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s)))
    return np.degrees(th / n + np.radians(lam0)), np.degrees(phi)


# Defining constants (EPSG registry): (phi1, phi2, phi0, lam0, FE, FN)
ALBERS_ZONES = {
    5070: (29.5, 45.5, 23.0, -96.0, 0.0, 0.0),              # NAD83 / CONUS Albers
    3310: (34.0, 40.5, 0.0, -120.0, 0.0, -4_000_000.0),     # NAD83 / California Albers
    3577: (-18.0, -36.0, 0.0, 132.0, 0.0, 0.0),             # GDA94 / Australian Albers
}


def make_valid_rings(xs: np.ndarray, ys: np.ndarray, offsets=None,
                     quant: float = 1e-9, eps_off: float = None) -> list:
    """ST_MakeValid analog: re-extract the EVEN-ODD region of a possibly
    self-intersecting / mis-oriented / degenerate polygon as properly
    oriented simple rings (outer CCW, holes CW) via the arrangement
    kernel — a bowtie splits into its two lobes, zero-area geometry
    returns []. Valid input comes back equivalent (possibly re-oriented).
    """
    polys = _normalize_polys([(xs, ys, offsets)])
    xs_n, ys_n, offs_n = polys[0]
    return _arrangement_region(
        polys, lambda px, py: points_in_rings(px, py, xs_n, ys_n, offs_n),
        quant=quant, eps_off=eps_off)


def min_enclosing_circle(xs: np.ndarray, ys: np.ndarray):
    """Smallest circle containing every point: Welzl's randomized
    incremental miniball (the three-loop non-recursive form), expected
    O(n). The minimum enclosing circle is UNIQUE, so the fixed-seed
    shuffle affects running time only, never the answer. Returns
    (cx, cy, r); r == 0.0 for a single distinct point.

    Boundary tolerance is relative (1 + 1e-12) so cocircular inputs do
    not thrash between equivalent support sets."""
    pts = np.unique(np.column_stack([np.asarray(xs, np.float64),
                                     np.asarray(ys, np.float64)]), axis=0)
    n = pts.shape[0]
    if n == 0:
        return math.nan, math.nan, math.nan
    if n == 1:
        return float(pts[0, 0]), float(pts[0, 1]), 0.0
    P = pts[np.random.default_rng(12345).permutation(n)]

    def d2(p, c):
        return (p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2

    def circ2(a, b):
        c = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
        return c, d2(a, c)

    def circ3(a, b, c):
        d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                   + c[0] * (a[1] - b[1]))
        if d == 0.0:
            return None
        a2 = a[0] ** 2 + a[1] ** 2
        b2 = b[0] ** 2 + b[1] ** 2
        c2 = c[0] ** 2 + c[1] ** 2
        ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
        uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
        ctr = (ux, uy)
        return ctr, max(d2(a, ctr), d2(b, ctr), d2(c, ctr))

    TOL = 1.0 + 1e-12
    ctr, r2 = circ2(P[0], P[1])
    for i in range(2, n):
        if d2(P[i], ctr) <= r2 * TOL:
            continue
        ctr, r2 = circ2(P[0], P[i])
        for j in range(1, i):
            if d2(P[j], ctr) <= r2 * TOL:
                continue
            ctr, r2 = circ2(P[j], P[i])
            for k in range(j):
                if d2(P[k], ctr) <= r2 * TOL:
                    continue
                got = circ3(P[k], P[j], P[i])
                if got is not None:
                    ctr, r2 = got
    return float(ctr[0]), float(ctr[1]), float(math.sqrt(r2))


def oriented_envelope(xs: np.ndarray, ys: np.ndarray):
    """Minimum-AREA rotated rectangle: the optimum has a side collinear
    with a convex-hull edge (Freeman & Shapira 1975), so project the
    hull onto each edge-aligned basis and keep the smallest box —
    O(h²) over hull vertices, exact, deterministic. Returns
    (rect_xs[4], rect_ys[4] CCW, area) or None when the hull is
    degenerate (< 3 strict hull vertices: point / collinear input)."""
    hx, hy = convex_hull(np.asarray(xs, np.float64),
                         np.asarray(ys, np.float64))
    h = hx.shape[0]
    if h < 3:
        return None
    H = np.column_stack([hx, hy])
    best = None
    for i in range(h):
        ex = hx[(i + 1) % h] - hx[i]
        ey = hy[(i + 1) % h] - hy[i]
        ln = math.hypot(ex, ey)
        if ln == 0.0:
            continue
        ux, uy = ex / ln, ey / ln
        s = H @ np.array([ux, uy])
        t = H @ np.array([-uy, ux])
        area = (s.max() - s.min()) * (t.max() - t.min())
        if best is None or area < best[0]:
            best = (float(area), ux, uy,
                    float(s.min()), float(s.max()),
                    float(t.min()), float(t.max()))
    if best is None:
        return None
    area, ux, uy, s0, s1, t0, t1 = best
    # corners in (u, v) box order -> world frame; u x v is CCW already
    corners = [(s0, t0), (s1, t0), (s1, t1), (s0, t1)]
    rx = np.array([s * ux - t * uy for s, t in corners])
    ry = np.array([s * uy + t * ux for s, t in corners])
    return rx, ry, area


def interior_point(xs: np.ndarray, ys: np.ndarray, offsets=None):
    """Guaranteed-interior representative point of an even-odd polygon
    (the ST_PointOnSurface kernel): scanline at a y* strictly between
    two consecutive DISTINCT vertex ordinates bracketing the first
    ring's vertical midpoint — such a line crosses no vertex, so the
    even-odd x-crossings pair cleanly; return the midpoint of the
    WIDEST inside interval. The first ring is an outer ring by the
    engine's storage convention, so it always spans y* and the
    crossing list is non-empty even when other parts lie entirely
    above/below. Degenerate (zero y-extent) input falls back to the
    first vertex. Returns (x, y)."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    rings = list(rings_of(xs, ys, offsets))
    r0y = rings[0][1]
    if r0y.max() == r0y.min():
        return float(xs[0]), float(ys[0])
    yc = 0.5 * (r0y.min() + r0y.max())
    vys = np.unique(ys)
    lo = vys[vys <= yc].max()
    above = vys[vys > lo]
    hi = above.min() if above.size else vys.max()
    ystar = 0.5 * (lo + hi)
    crossings = []
    for rx, ry in rings:
        n = rx.shape[0]
        for i in range(n):
            j = (i + 1) % n
            y1, y2 = ry[i], ry[j]
            if (y1 < ystar) != (y2 < ystar):
                t = (ystar - y1) / (y2 - y1)
                crossings.append(rx[i] + t * (rx[j] - rx[i]))
    crossings.sort()
    best, bx = -1.0, float(xs[0])
    for a, b in zip(crossings[0::2], crossings[1::2]):
        if b - a > best:
            best, bx = b - a, 0.5 * (a + b)
    return float(bx), float(ystar)
