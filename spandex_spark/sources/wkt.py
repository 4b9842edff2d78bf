"""WKT geometry interop — the text twin of sources/wkb.py.

Reference semantics: spandex's PostGIS layer accepts/emits WKT through
ST_GeomFromText / ST_AsText in its SQL templates (spandex/spatialtoolz.py
builds geometry literals this way when not binding WKB); GeoJSON-less
interchange (CSVs of WKT, QGIS clipboards, test fixtures) is the other
place users meet it. Implemented against the OGC Simple Features text
grammar (OGC 06-103r4 §7): Point, LineString, Polygon, MultiPoint (both
nestings), MultiLineString, MultiPolygon, each with EMPTY, plus the
PostGIS ``SRID=n;`` EWKT prefix on input. Z/M suffixes and
GeometryCollection raise — same boundary as the WKB codec.

Ring conventions are shared with sources/wkb.py (closed↔open conversion,
orientation normalization, CCW-opens-a-part grouping) — the two codecs
literally call the same helpers, so WKB and WKT round-trips cannot
diverge.

Scale shape: per-geometry text kernels wrapped in Arrow-batched pandas
UDFs (``to_wkt``/``from_wkt``) — embarrassingly parallel, nothing routes
through the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from spandex_spark.sources.wkb import (_assemble, _group_polygons,
                                       _norm_ring, _rings_of)


def _fmt(x: float) -> str:
    s = repr(float(x))
    return s[:-2] if s.endswith(".0") else s


def _fmt_seq(rx, ry) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in zip(rx, ry))


def _fmt_ring(rx, ry) -> str:
    # engine rings are OPEN; WKT rings are CLOSED
    cx = np.append(rx, rx[0])
    cy = np.append(ry, ry[0])
    return "(" + _fmt_seq(cx, cy) + ")"


def geom_to_wkt(g: dict | None, *, srid: int | None = None) -> str | None:
    """Engine struct-of-arrays geometry → WKT text (``srid`` adds the
    PostGIS ``SRID=n;`` EWKT prefix)."""
    if g is None:
        return None
    pre = f"SRID={srid};" if srid is not None else ""
    kind = int(g["kind"])
    if kind == 1:
        rings = _rings_of(g)
        rx, ry = rings[0]
        if rx.shape[0] == 1:
            return f"{pre}POINT ({_fmt(rx[0])} {_fmt(ry[0])})"
        pts = ", ".join(f"({_fmt(x)} {_fmt(y)})" for x, y in zip(rx, ry))
        return f"{pre}MULTIPOINT ({pts})"
    if kind == 2:
        parts = _rings_of(g)
        if len(parts) == 1:
            return f"{pre}LINESTRING ({_fmt_seq(*parts[0])})"
        body = ", ".join(f"({_fmt_seq(rx, ry)})" for rx, ry in parts)
        return f"{pre}MULTILINESTRING ({body})"
    if kind in (3, 6):
        polys = _group_polygons(g)
        if len(polys) == 1:
            body = ", ".join(_fmt_ring(rx, ry) for rx, ry in polys[0])
            return f"{pre}POLYGON ({body})"
        body = ", ".join(
            "(" + ", ".join(_fmt_ring(rx, ry) for rx, ry in poly) + ")"
            for poly in polys)
        return f"{pre}MULTIPOLYGON ({body})"
    raise NotImplementedError(f"geom kind {kind}")


_TYPE_RE = re.compile(
    r"^\s*(?:SRID=\d+\s*;\s*)?([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY|\()",
    re.IGNORECASE)
_NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _parse_groups(body: str, depth: int) -> list:
    """Parse a parenthesized WKT body into nested lists of coordinate
    pairs. ``depth`` = nesting below the outermost parens (0: one
    sequence, 1: list of sequences, 2: list of lists of sequences)."""
    if depth == 0:
        nums = [float(m) for m in _NUM_RE.findall(body)]
        if len(nums) % 2:
            raise ValueError(f"odd coordinate count in WKT: {body[:60]!r}")
        a = np.asarray(nums, np.float64).reshape(-1, 2)
        return [np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])]
    out = []
    level = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if level == 0:
                start = i + 1
            level += 1
        elif ch == ")":
            level -= 1
            if level == 0:
                out.append(_parse_groups(body[start:i], depth - 1))
    if not out:
        raise ValueError(f"malformed WKT body: {body[:60]!r}")
    return out


def wkt_to_geom(s: str | None) -> dict | None:
    """WKT / EWKT text → engine struct-of-arrays geometry dict (None /
    EMPTY → None)."""
    if s is None:
        return None
    m = _TYPE_RE.match(s)
    if not m:
        raise ValueError(f"not WKT: {s[:60]!r}")
    typ = m.group(1).upper()
    if m.group(2):
        raise NotImplementedError(f"WKT {m.group(2).upper()} dimensions")
    if typ == "GEOMETRYCOLLECTION":
        raise NotImplementedError("GeometryCollection")
    if m.group(3).upper() == "EMPTY":
        return None
    body = s[m.end() - 1:]
    # strip to the balanced outer parens
    level = 0
    for i, ch in enumerate(body):
        level += ch == "("
        level -= ch == ")"
        if level == 0 and ch == ")":
            body = body[1:i]
            break
    if typ == "POINT":
        (rx, ry) = _parse_groups(body, 0)
        if rx.shape[0] == 0:
            return None
        return {"kind": 1, "xs": [float(rx[0])], "ys": [float(ry[0])],
                "ring_offsets": [0, 1],
                "bbox": {"minx": float(rx[0]), "miny": float(ry[0]),
                         "maxx": float(rx[0]), "maxy": float(ry[0])}}
    if typ == "MULTIPOINT":
        # both nestings are legal: (1 2, 3 4) and ((1 2), (3 4))
        rx, ry = _parse_groups(body, 0)
        return _assemble(1, [(rx, ry)])
    if typ == "LINESTRING":
        rx, ry = _parse_groups(body, 0)
        return _assemble(2, [(rx, ry)])
    if typ == "MULTILINESTRING":
        parts = [(g[0], g[1]) for g in _parse_groups(body, 1)]
        return _assemble(2, parts)
    if typ == "POLYGON":
        rings = [_norm_ring(g[0], g[1], want_ccw=(i == 0))
                 for i, g in enumerate(_parse_groups(body, 1))]
        return _assemble(3 if len(rings) == 1 else 6, rings)
    if typ == "MULTIPOLYGON":
        rings = []
        for poly in _parse_groups(body, 2):
            for i, g in enumerate(poly):
                rings.append(_norm_ring(g[0], g[1], want_ccw=(i == 0)))
        return _assemble(3 if len(rings) == 1 else 6, rings)
    raise ValueError(f"unknown WKT type {typ}")


# ----------------------------------------------------------- Spark level

def to_wkt(df, geom_col: str = "geom", out_col: str = "wkt", *,
           srid: int | None = None):
    """Append a StringType WKT column serialized from ``geom_col``."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _ser(kind: pd.Series, xs: pd.Series, ys: pd.Series,
             offs: pd.Series) -> pd.Series:
        out = []
        for k, x, y, o in zip(kind, xs, ys, offs):
            if k is None or pd.isna(k):
                out.append(None)
                continue
            g = {"kind": int(k), "xs": x, "ys": y, "ring_offsets": o}
            out.append(geom_to_wkt(g, srid=srid))
        return pd.Series(out, dtype=object)

    g = F.col(geom_col)
    return df.withColumn(
        out_col, _ser(g["kind"], g["xs"], g["ys"], g["ring_offsets"]))


def from_wkt(df, wkt_col: str = "wkt", out_col: str = "geom"):
    """Append an engine geometry struct column parsed from WKT text."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from spandex_spark.operators.trim import _GEOM_TYPE

    @pandas_udf(_GEOM_TYPE)
    def _de(s: pd.Series) -> pd.DataFrame:
        kinds, xs, ys, offs, bbs = [], [], [], [], []
        for t in s:
            g = wkt_to_geom(t)
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

    out = df.withColumn(out_col, _de(F.col(wkt_col)))
    return out.withColumn(
        out_col,
        F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))
