"""(E)WKB geometry interop — pure numpy/struct, no shapely/GEOS.

Reference semantics: spandex's storage layer is PostGIS, whose native
geometry wire format is WKB (spandex/io.py::TableLoader reflects geometry
columns via GeoAlchemy2; every table it loads stores EWKB). Any user
bringing GeoParquet or PostGIS exports to this engine meets WKB before
anything else, so the engine speaks it natively, both directions and both
byte orders, against the public OGC Simple Features spec (OGC 06-103r4
§8.2.8) plus the PostGIS EWKB SRID extension:

* read: Point(1), LineString(2), Polygon(3), MultiPoint(4),
  MultiLineString(5), MultiPolygon(6); EWKB SRID flag (0x20000000) is
  parsed and skipped; NDR (little) and XDR (big), mixed per nested
  geometry as the spec allows.  Z/M dimensions (ISO type+1000/+2000/+3000
  or EWKB 0x80000000/0x40000000 flags) and GeometryCollection(7) raise —
  an honest capability boundary, same policy as sources/shapefile.py.
* write: the same six types, NDR by default, optional EWKB SRID.

Ring conventions: WKB stores CLOSED rings (first vertex repeated); the
engine stores OPEN rings.  OGC orientation (exterior CCW, holes CW)
matches the engine's convention, but PostGIS does NOT enforce ring
orientation in WKB, so the reader re-normalizes by signed area: first
ring of each polygon → CCW, subsequent rings → CW.  An engine
multipolygon (kind 6) is a flat ring list where each CCW ring opens a new
part and following CW rings are its holes — exactly the grouping the
writer uses to rebuild WKB Polygon lists.

Scale shape: ``geom_to_wkb``/``wkb_to_geom`` are per-geometry kernels;
``to_wkb``/``from_wkb`` wrap them in Arrow-batched pandas UDFs, so
(de)serializing a 10^12-row table is embarrassingly parallel over
partitions — geometry bytes never route through the driver.  WKB is an
inherently per-row varlen format (as is shapefile record parsing); the
struct-of-arrays encoding exists precisely so everything AFTER ingest
runs columnar.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


# ---------------------------------------------------------------- writer

def _rings_of(g: dict) -> list[tuple[np.ndarray, np.ndarray]]:
    xs = np.asarray(g["xs"], np.float64)
    ys = np.asarray(g["ys"], np.float64)
    offs = g.get("ring_offsets")
    offs = (np.asarray(offs, np.int64)
            if offs is not None and len(offs) >= 2
            else np.array([0, xs.shape[0]], np.int64))
    return [(xs[offs[r]:offs[r + 1]], ys[offs[r]:offs[r + 1]])
            for r in range(offs.shape[0] - 1)]


def _signed_area(rx: np.ndarray, ry: np.ndarray) -> float:
    return 0.5 * float(np.sum(rx * np.roll(ry, -1) - np.roll(rx, -1) * ry))


def _pack_ring(e: str, rx: np.ndarray, ry: np.ndarray) -> bytes:
    # engine rings are OPEN; WKB rings are CLOSED
    cx = np.append(rx, rx[0])
    cy = np.append(ry, ry[0])
    pts = np.column_stack([cx, cy]).astype("<f8" if e == "<" else ">f8")
    return struct.pack(e + "I", cx.shape[0]) + pts.tobytes()


def _group_polygons(g: dict) -> list[list[tuple[np.ndarray, np.ndarray]]]:
    """Split the flat ring list into polygons: a CCW ring opens a new
    part; CW rings become holes of the part they follow (the engine's
    valid-nesting layout guarantees holes follow their outer)."""
    polys: list[list] = []
    for rx, ry in _rings_of(g):
        if _signed_area(rx, ry) >= 0 or not polys:
            polys.append([(rx, ry)])
        else:
            polys[-1].append((rx, ry))
    return polys


def geom_to_wkb(g: dict | None, *, byte_order: str = "little",
                srid: int | None = None) -> bytes | None:
    """Engine struct-of-arrays geometry → (E)WKB bytes.

    ``srid`` adds the PostGIS EWKB SRID header (what a PostGIS
    ``geometry(…, 4326)`` column stores); omit it for pure OGC WKB."""
    if g is None:
        return None
    if byte_order not in ("little", "big"):
        raise ValueError(f"byte_order must be little|big, got {byte_order!r}")
    e = "<" if byte_order == "little" else ">"
    bo = b"\x01" if e == "<" else b"\x00"

    def head(wtype: int, with_srid: bool) -> bytes:
        t = wtype | (_EWKB_SRID if (with_srid and srid is not None) else 0)
        out = bo + struct.pack(e + "I", t)
        if with_srid and srid is not None:
            out += struct.pack(e + "I", srid)
        return out

    kind = int(g["kind"])
    if kind == 1:
        rings = _rings_of(g)
        rx, ry = rings[0]
        if rx.shape[0] == 1:
            return (head(_WKB_POINT, True)
                    + struct.pack(e + "dd", float(rx[0]), float(ry[0])))
        # several points under kind 1 = MultiPoint (shapefile type-8 analog)
        body = struct.pack(e + "I", rx.shape[0])
        for x, y in zip(rx, ry):
            body += bo + struct.pack(e + "I", _WKB_POINT)
            body += struct.pack(e + "dd", float(x), float(y))
        return head(_WKB_MULTIPOINT, True) + body
    if kind == 2:
        parts = _rings_of(g)
        if len(parts) == 1:
            rx, ry = parts[0]
            pts = np.column_stack([rx, ry]).astype(
                "<f8" if e == "<" else ">f8")
            return (head(_WKB_LINESTRING, True)
                    + struct.pack(e + "I", rx.shape[0]) + pts.tobytes())
        body = struct.pack(e + "I", len(parts))
        for rx, ry in parts:
            pts = np.column_stack([rx, ry]).astype(
                "<f8" if e == "<" else ">f8")
            body += (bo + struct.pack(e + "I", _WKB_LINESTRING)
                     + struct.pack(e + "I", rx.shape[0]) + pts.tobytes())
        return head(_WKB_MULTILINESTRING, True) + body
    if kind in (3, 6):
        polys = _group_polygons(g)
        if len(polys) == 1:
            body = struct.pack(e + "I", len(polys[0]))
            for rx, ry in polys[0]:
                body += _pack_ring(e, rx, ry)
            return head(_WKB_POLYGON, True) + body
        body = struct.pack(e + "I", len(polys))
        for poly in polys:
            body += bo + struct.pack(e + "I", _WKB_POLYGON)
            body += struct.pack(e + "I", len(poly))
            for rx, ry in poly:
                body += _pack_ring(e, rx, ry)
        return head(_WKB_MULTIPOLYGON, True) + body
    raise NotImplementedError(f"geom kind {kind}")


# ---------------------------------------------------------------- reader

class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals

    def doubles(self, n: int, e: str) -> np.ndarray:
        a = np.frombuffer(self.buf, "<f8" if e == "<" else ">f8",
                          n, self.pos)
        self.pos += 8 * n
        return a


def _read_header(c: _Cursor) -> tuple[str, int, int | None]:
    (bo,) = c.take("B")
    if bo not in (0, 1):
        raise ValueError(f"bad WKB byte order {bo}")
    e = "<" if bo == 1 else ">"
    (raw,) = c.take(e + "I")
    srid = None
    if raw & (_EWKB_Z | _EWKB_M):
        raise NotImplementedError("Z/M WKB dimensions")
    if raw & _EWKB_SRID:
        (srid,) = c.take(e + "I")
    base = raw & 0x0FFFFFFF
    if base >= 1000:  # ISO Z/M/ZM blocks
        raise NotImplementedError(f"ISO WKB dimension type {base}")
    return e, base, srid


def _norm_ring(rx: np.ndarray, ry: np.ndarray,
               want_ccw: bool) -> tuple[np.ndarray, np.ndarray]:
    """Drop the WKB closing vertex and enforce engine orientation."""
    if rx.shape[0] > 1 and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    a = _signed_area(rx, ry)
    if (a > 0) != want_ccw and a != 0:
        rx, ry = rx[::-1], ry[::-1]
    return np.ascontiguousarray(rx), np.ascontiguousarray(ry)


def _read_polygon_rings(c: _Cursor, e: str) -> list:
    (nrings,) = c.take(e + "I")
    rings = []
    for r in range(nrings):
        (npts,) = c.take(e + "I")
        pts = c.doubles(2 * npts, e).reshape(-1, 2)
        rings.append(_norm_ring(pts[:, 0], pts[:, 1], want_ccw=(r == 0)))
    return rings


def _assemble(kind: int, rings: list) -> dict | None:
    xs = np.concatenate([r[0] for r in rings])
    ys = np.concatenate([r[1] for r in rings])
    if xs.shape[0] == 0:
        return None
    offs = np.cumsum([0] + [r[0].shape[0] for r in rings])
    return {"kind": kind, "xs": xs.tolist(), "ys": ys.tolist(),
            "ring_offsets": [int(v) for v in offs],
            "bbox": {"minx": float(xs.min()), "miny": float(ys.min()),
                     "maxx": float(xs.max()), "maxy": float(ys.max())}}


def wkb_to_geom(buf: bytes | None) -> dict | None:
    """(E)WKB bytes → engine struct-of-arrays geometry dict (None in =
    None out; POINT EMPTY, encoded NaN-NaN per PostGIS, also → None)."""
    if buf is None:
        return None
    c = _Cursor(bytes(buf))
    e, wtype, _ = _read_header(c)
    if wtype == _WKB_POINT:
        x, y = c.take(e + "dd")
        if np.isnan(x) and np.isnan(y):
            return None
        return {"kind": 1, "xs": [x], "ys": [y], "ring_offsets": [0, 1],
                "bbox": {"minx": x, "miny": y, "maxx": x, "maxy": y}}
    if wtype == _WKB_LINESTRING:
        (npts,) = c.take(e + "I")
        pts = c.doubles(2 * npts, e).reshape(-1, 2)
        return _assemble(2, [(np.ascontiguousarray(pts[:, 0]),
                              np.ascontiguousarray(pts[:, 1]))])
    if wtype == _WKB_POLYGON:
        rings = _read_polygon_rings(c, e)
        return _assemble(3 if len(rings) == 1 else 6, rings)
    if wtype == _WKB_MULTIPOINT:
        (n,) = c.take(e + "I")
        px, py = [], []
        for _ in range(n):
            se, st, _ = _read_header(c)
            if st != _WKB_POINT:
                raise ValueError(f"MultiPoint holds type {st}")
            x, y = c.take(se + "dd")
            px.append(x); py.append(y)
        return _assemble(1, [(np.asarray(px), np.asarray(py))])
    if wtype == _WKB_MULTILINESTRING:
        (n,) = c.take(e + "I")
        parts = []
        for _ in range(n):
            se, st, _ = _read_header(c)
            if st != _WKB_LINESTRING:
                raise ValueError(f"MultiLineString holds type {st}")
            (npts,) = c.take(se + "I")
            pts = c.doubles(2 * npts, se).reshape(-1, 2)
            parts.append((np.ascontiguousarray(pts[:, 0]),
                          np.ascontiguousarray(pts[:, 1])))
        return _assemble(2, parts)
    if wtype == _WKB_MULTIPOLYGON:
        (n,) = c.take(e + "I")
        rings = []
        for _ in range(n):
            se, st, _ = _read_header(c)
            if st != _WKB_POLYGON:
                raise ValueError(f"MultiPolygon holds type {st}")
            rings.extend(_read_polygon_rings(c, se))
        return _assemble(3 if len(rings) == 1 else 6, rings)
    raise NotImplementedError(f"WKB geometry type {wtype}")


# ----------------------------------------------------------- Spark level

def to_wkb(df, geom_col: str = "geom", out_col: str = "wkb", *,
           byte_order: str = "little", srid: int | None = None):
    """Append a BinaryType (E)WKB column serialized from ``geom_col``.
    Arrow-batched pandas UDF — runs where the data lives."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _ser(kind: pd.Series, xs: pd.Series, ys: pd.Series,
             offs: pd.Series) -> pd.Series:
        out = []
        for k, x, y, o in zip(kind, xs, ys, offs):
            if k is None or pd.isna(k):
                out.append(None)
                continue
            g = {"kind": int(k), "xs": x, "ys": y, "ring_offsets": o}
            out.append(geom_to_wkb(g, byte_order=byte_order, srid=srid))
        return pd.Series(out, dtype=object)

    g = F.col(geom_col)
    return df.withColumn(
        out_col, _ser(g["kind"], g["xs"], g["ys"], g["ring_offsets"]))


def from_wkb(df, wkb_col: str = "wkb", out_col: str = "geom"):
    """Append an engine geometry struct column parsed from (E)WKB bytes."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from spandex_spark.operators.trim import _GEOM_TYPE

    @pandas_udf(_GEOM_TYPE)
    def _de(s: pd.Series) -> pd.DataFrame:
        kinds, xs, ys, offs, bbs = [], [], [], [], []
        for b in s:
            g = wkb_to_geom(b)
            if g is None:
                kinds.append(None); xs.append(None); ys.append(None)
                offs.append(None); bbs.append(None)
            else:
                kinds.append(g["kind"]); xs.append(g["xs"])
                ys.append(g["ys"]); offs.append(g["ring_offsets"])
                bbs.append(g["bbox"])
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": xs, "ys": ys,
                             "ring_offsets": offs, "bbox": bbs})

    out = df.withColumn(out_col, _de(F.col(wkb_col)))
    return out.withColumn(
        out_col,
        F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))
