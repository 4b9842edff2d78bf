"""KML (OGC KML 2.2 / Google Earth) Placemarks → engine geometry
structs — the last member of the consumer-format family next to
GeoJSON, GPX, shapefile, GeoPackage, WKT/WKB and MVT.

Split of labour follows `sources/gpx.py`: Placemark elements are
pulled out with ONE JVM regexp + posexplode (Placemarks never nest),
names and coordinates ride as strings, and the geometry assembly —
`<coordinates>` is a whitespace-separated list of ``lon,lat[,alt]``
tuples under Point / LineString / Polygon(outer/innerBoundaryIs) /
MultiGeometry — happens in one Arrow pass reusing the WKB/GeoJSON
assembly kernels (`wkb._assemble`/`_norm_ring`), so KML rings obey
the exact same orientation/normalization contract as every other
loader (outer CCW, holes CW).

Altitude values are dropped (the engine is 2-D; the same documented
trade as geojson's NotImplementedError on 3-D, but KML's third tuple
member is ubiquitous-and-zero in the wild, so dropping beats raising).

Scale shape: the Placemark explode is map-only JVM; the assembly UDF
is the one documented Python pass (geometry loaders' convention);
nothing shuffles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spandex_spark.sources.wkb import _assemble, _norm_ring

__all__ = ["parse_kml"]

_PM_RE = r"(?is)<Placemark[^>]*>(.*?)</Placemark>"
_NAME_RE = r"(?is)<name[^>]*>([^<]*)</name>"
_POINT = re.compile(r"(?is)<Point[^>]*>.*?<coordinates[^>]*>(.*?)"
                    r"</coordinates>.*?</Point>")
_LINE = re.compile(r"(?is)<LineString[^>]*>.*?<coordinates[^>]*>(.*?)"
                   r"</coordinates>.*?</LineString>")
_POLY = re.compile(r"(?is)<Polygon[^>]*>(.*?)</Polygon>")
_OUTER = re.compile(r"(?is)<outerBoundaryIs>.*?<coordinates[^>]*>(.*?)"
                    r"</coordinates>")
_INNER = re.compile(r"(?is)<innerBoundaryIs>.*?<coordinates[^>]*>(.*?)"
                    r"</coordinates>")


def _coords(text: str) -> tuple[np.ndarray, np.ndarray]:
    xs, ys = [], []
    for tok in text.split():
        parts = tok.split(",")
        if len(parts) >= 2:
            xs.append(float(parts[0]))
            ys.append(float(parts[1]))
    return np.asarray(xs, np.float64), np.asarray(ys, np.float64)


def _pm_geom(xml: str) -> dict | None:
    pts = [_coords(m) for m in _POINT.findall(xml)]
    lines = [_coords(m) for m in _LINE.findall(xml)]
    polys = _POLY.findall(xml)
    rings = []
    for p in polys:
        outer = _OUTER.search(p)
        if not outer:
            continue
        # skip rings with empty <coordinates> (mirrors the line/point
        # filtering below): a zero-length ring next to a real polygon in
        # the same Placemark would emit degenerate repeated ring_offsets
        # (ADVICE r5)
        oxy = _coords(outer.group(1))
        if not oxy[0].size:
            continue
        rings.append(_norm_ring(*oxy, want_ccw=True))
        for inner in _INNER.findall(p):
            ixy = _coords(inner)
            if ixy[0].size:
                rings.append(_norm_ring(*ixy, want_ccw=False))
    # mixed-type MultiGeometry: polygons dominate, else lines, else
    # points (the engine struct holds one kind; documented reduction)
    if rings:
        return _assemble(3 if len(rings) == 1 else 6, rings)
    if lines:
        return _assemble(2, [ln for ln in lines if ln[0].size])
    if pts:
        good = [p for p in pts if p[0].size]
        if not good:
            return None
        return _assemble(1, good)
    return None


def parse_kml(df: DataFrame, *, kml_col: str = "kml",
              id_col: str = "doc_id") -> DataFrame:
    """(id_col, pm, name, geom) per Placemark — ``pm`` the 0-based
    Placemark index in document order, ``name`` the Placemark's
    ``<name>`` (NULL when absent), ``geom`` the engine struct (NULL
    for Placemarks with no coordinates).  NULL kml rows emit nothing;
    binary columns decode as UTF-8."""
    from spandex_spark.operators.trim import _GEOM_TYPE
    g = F.col(kml_col)
    xml = F.when(g.isNotNull(), g.cast("string"))
    pms = F.regexp_extract_all(xml, F.lit(_PM_RE), 1)
    rows = df.select(F.col(id_col),
                     F.posexplode(pms).alias("pm", "_pm_xml"))
    name = F.regexp_extract(F.col("_pm_xml"), _NAME_RE, 1)

    @pandas_udf(_GEOM_TYPE)
    def _geom(xmls: pd.Series) -> pd.DataFrame:
        kinds, xs, ys, offs, bbs = [], [], [], [], []
        for t in xmls:
            g = _pm_geom(t)
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

    out = (rows.select(
        id_col, "pm",
        F.when(name != "", F.trim(name)).alias("name"),
        _geom(F.col("_pm_xml")).alias("geom")))
    # the struct itself must be NULL (not a struct of NULLs) for
    # coordinate-less Placemarks — the from_geojson convention
    return out.withColumn(
        "geom", F.when(F.col("geom.kind").isNotNull(), F.col("geom")))
