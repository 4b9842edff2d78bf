"""Topology-preserving simplification — the TopoJSON / mapshaper /
`ST_SimplifyPreserveTopology`-fabric workflow: adjacent polygons
simplify WITHOUT slivers because every shared boundary arc is
simplified ONCE and reused by both sides.

Per group (the union_by executor-sized-fabric contract: group by
tile/county; parcel fabrics are spatially local so this is the natural
partitioning):

1. every ring decomposes into directed edges with quantized endpoints;
2. JUNCTIONS are vertices whose undirected-edge degree ≠ 2 — where
   arcs must split so each polygon can reuse its own subset;
3. ARCS are maximal chains between junctions (a ring with no junction
   is one closed arc); each UNDIRECTED arc is simplified once with the
   Douglas–Peucker keep-mask (geom.simplify_chain — endpoints pinned,
   so junctions never move);
4. every ring reassembles by walking its original arc sequence,
   flipping shared arcs as needed — both users of a boundary get the
   IDENTICAL simplified chain, which is the whole theorem: the union
   of the fabric is unchanged except where the boundary itself moved,
   and no gaps/overlaps appear between neighbors.

Caveats (the standard ones — mapshaper documents the same): an
aggressively simplified arc can self-intersect or collapse a thin
polygon to zero area; tolerance is the caller's contract.  Rings that
collapse below 3 vertices come back NULL.

Plan shape: ONE groupBy carrying (group, polygon id, geom) into an
Arrow kernel; no other shuffle.  No reference analog (spandex
delegates to PostGIS ST_Simplify, which is NOT topology-preserving
across features; SURVEY.md §2.1 O4 family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark import geom as _geom
from spandex_spark.operators.trim import _GEOM_TYPE

__all__ = ["simplify_topology"]


def _ring_arcs(rings_by_poly: dict, quant: float):
    """Decompose all rings into shared arcs.

    ``rings_by_poly``: {poly_key: [ring (xs, ys) CCW/CW as given]}.
    Returns (arcs, ring_paths): arcs = {arc_id: (xs, ys)} undirected
    canonical chains; ring_paths = {poly_key: [[(arc_id, flipped),
    ...] per ring]}.
    """
    def snap(x, y):
        return (round(x / quant) * quant, round(y / quant) * quant)

    # undirected edge degree per vertex
    nbrs: dict = {}
    ring_pts = {}
    for pk, rings in rings_by_poly.items():
        ring_pts[pk] = []
        for rx, ry in rings:
            pts = [snap(x, y) for x, y in zip(rx, ry)]
            ded = [p for i, p in enumerate(pts)
                   if p != pts[(i - 1) % len(pts)]]
            if len(ded) < 3:
                ring_pts[pk].append(None)
                continue
            ring_pts[pk].append(ded)
            n = len(ded)
            for i in range(n):
                a, b = ded[i], ded[(i + 1) % n]
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
    junctions = {v for v, s in nbrs.items() if len(s) != 2}

    arcs: dict = {}
    arc_ids: dict = {}
    ring_paths: dict = {}

    def register(chain):
        key_f = tuple(chain)
        key_r = tuple(reversed(chain))
        if key_f in arc_ids:
            return arc_ids[key_f], False
        if key_r in arc_ids:
            return arc_ids[key_r], True
        aid = len(arcs)
        arcs[aid] = chain
        arc_ids[key_f] = aid
        return aid, False

    for pk, rings in ring_pts.items():
        paths = []
        for ded in rings:
            if ded is None:
                paths.append(None)
                continue
            n = len(ded)
            j_idx = [i for i, p in enumerate(ded) if p in junctions]
            path = []
            if not j_idx:
                # closed arc: canonical start = lexicographic min vertex
                # so the same isolated ring shared twice dedups
                s = min(range(n), key=lambda i: ded[i])
                chain = [ded[(s + k) % n] for k in range(n)] + [ded[s]]
                path.append(register(chain))
            else:
                for a_i in range(len(j_idx)):
                    i0 = j_idx[a_i]
                    i1 = j_idx[(a_i + 1) % len(j_idx)]
                    chain = []
                    k = i0
                    while True:
                        chain.append(ded[k])
                        if k == i1 and len(chain) > 1:
                            break
                        k = (k + 1) % n
                        if k == i0:  # wrapped fully (single junction)
                            chain.append(ded[k])
                            break
                    path.append(register(chain))
            paths.append(path)
        ring_paths[pk] = paths
    return arcs, ring_paths


def _simplify_arcs(arcs: dict, tol: float) -> dict:
    out = {}
    for aid, chain in arcs.items():
        xs = np.array([p[0] for p in chain])
        ys = np.array([p[1] for p in chain])
        if xs.shape[0] <= 2 or tol <= 0:
            out[aid] = chain
            continue
        keep = _geom.simplify_chain(xs, ys, tol)
        out[aid] = [chain[i] for i in np.nonzero(keep)[0]]
    return out


def _rebuild(path, sarcs) -> tuple | None:
    pts = []
    for aid, flipped in path:
        chain = sarcs[aid]
        seq = list(reversed(chain)) if flipped else list(chain)
        if pts:
            seq = seq[1:]  # join at the shared junction
        pts.extend(seq)
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    if len(pts) < 3:
        return None
    return (np.array([p[0] for p in pts]),
            np.array([p[1] for p in pts]))


def simplify_topology(polys: DataFrame, *, tolerance: float,
                      group_cols: tuple, id_col: str,
                      geom_col: str = "geom", quant: float = 1e-9,
                      out_col: str = "geom") -> DataFrame:
    """Simplify a polygon fabric with shared-boundary consistency.
    Output: group_cols + (id_col, out_col); rings that collapse below
    3 vertices (or thoroughly degenerate inputs) come back NULL."""
    sel = polys.select(*group_cols, F.col(id_col).alias("_pid"),
                       F.col(geom_col).alias("_pgeom"))
    gfields = [polys.schema[c] for c in group_cols]
    out_schema = T.StructType(
        list(gfields) + [T.StructField(id_col,
                                       polys.schema[id_col].dataType),
                         T.StructField(out_col, _GEOM_TYPE)])

    def _simp_group(key, pdf):
        rings_by_poly = {}
        for pid, g in zip(pdf["_pid"], pdf["_pgeom"]):
            xs = np.asarray(g["xs"], np.float64)
            ys = np.asarray(g["ys"], np.float64)
            offs = g["ring_offsets"]
            offs = (np.asarray(offs, np.int64) if offs is not None
                    else np.array([0, xs.shape[0]], np.int64))
            rings_by_poly[pid] = [
                (xs[s:e], ys[s:e]) for s, e in zip(offs[:-1], offs[1:])
                if e - s >= 3]
        arcs, ring_paths = _ring_arcs(rings_by_poly, quant)
        sarcs = _simplify_arcs(arcs, float(tolerance))
        rows = []
        for pid in rings_by_poly:
            rings = []
            for path in ring_paths[pid]:
                if path is None:
                    continue
                rb = _rebuild(path, sarcs)
                if rb is not None:
                    rings.append(rb)
            row = dict(zip(group_cols, key))
            row[id_col] = pid
            if not rings:
                row[out_col] = None
            else:
                ax = np.concatenate([r[0] for r in rings])
                ay = np.concatenate([r[1] for r in rings])
                ro = np.cumsum([0] + [r[0].shape[0] for r in rings])
                row[out_col] = {
                    "kind": 3 if len(rings) == 1 else 6,
                    "xs": ax.tolist(), "ys": ay.tolist(),
                    "ring_offsets": [int(v) for v in ro],
                    "bbox": {"minx": float(ax.min()),
                             "miny": float(ay.min()),
                             "maxx": float(ax.max()),
                             "maxy": float(ay.max())}}
            rows.append(row)
        return pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return sel.groupBy(*group_cols).applyInPandas(_simp_group, out_schema)
