"""GeoJSON interop (RFC 7946) — the third geometry interchange format,
after (E)WKB (sources/wkb.py) and WKT (sources/wkt.py).

Reference semantics: spandex's UrbanSim users pull layers from web APIs
and QGIS exports as GeoJSON FeatureCollections; PostGIS speaks it as
ST_AsGeoJSON / ST_GeomFromGeoJSON. Covered: Point, MultiPoint,
LineString, MultiLineString, Polygon, MultiPolygon — ring conventions are
the engine's own (RFC 7946 §3.1.6 mandates exterior CCW / holes CW,
exactly the engine orientation; rings closed on the wire, open in the
struct), via the SAME ring helpers as the WKB/WKT codecs.
GeometryCollection raises; coordinates beyond (x, y) raise (honest
boundary, same policy as the siblings).

Two surfaces:

* column codecs ``to_geojson``/``from_geojson`` — JSON text per row,
  Arrow-batched pandas UDFs (embarrassingly parallel);
* file IO ``read_geojson``/``write_geojson`` — ONE FeatureCollection
  document. Like the shapefile loader, this is a bounded-size EDGE
  format (a single JSON document must be parsed whole); the 100 TB path
  stores geometry in Parquet/GeoParquet and uses this only for ingest or
  export of boundary layers.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from spandex_spark.sources.wkb import (_assemble, _group_polygons,
                                       _norm_ring, _rings_of)


def _ring_coords(rx, ry) -> list:
    cx = np.append(rx, rx[0])
    cy = np.append(ry, ry[0])
    return [[float(x), float(y)] for x, y in zip(cx, cy)]


def geom_to_geojson(g: dict | None) -> dict | None:
    """Engine struct-of-arrays geometry → GeoJSON geometry object."""
    if g is None:
        return None
    kind = int(g["kind"])
    if kind == 1:
        rings = _rings_of(g)
        rx, ry = rings[0]
        if rx.shape[0] == 1:
            return {"type": "Point",
                    "coordinates": [float(rx[0]), float(ry[0])]}
        return {"type": "MultiPoint",
                "coordinates": [[float(x), float(y)]
                                for x, y in zip(rx, ry)]}
    if kind == 2:
        parts = _rings_of(g)
        if len(parts) == 1:
            rx, ry = parts[0]
            return {"type": "LineString",
                    "coordinates": [[float(x), float(y)]
                                    for x, y in zip(rx, ry)]}
        return {"type": "MultiLineString",
                "coordinates": [[[float(x), float(y)]
                                 for x, y in zip(rx, ry)]
                                for rx, ry in parts]}
    if kind in (3, 6):
        polys = _group_polygons(g)
        if len(polys) == 1:
            return {"type": "Polygon",
                    "coordinates": [_ring_coords(rx, ry)
                                    for rx, ry in polys[0]]}
        return {"type": "MultiPolygon",
                "coordinates": [[_ring_coords(rx, ry) for rx, ry in poly]
                                for poly in polys]}
    raise NotImplementedError(f"geom kind {kind}")


def _coords_xy(seq) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(seq, np.float64)
    if a.ndim != 2 or a.shape[1] != 2:
        raise NotImplementedError(
            "GeoJSON coordinates beyond (x, y) (altitude/measures)")
    return np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])


def geojson_to_geom(obj) -> dict | None:
    """GeoJSON geometry object (dict or JSON string) → engine struct."""
    if obj is None:
        return None
    if isinstance(obj, str):
        obj = json.loads(obj)
    typ = obj.get("type")
    if typ == "Feature":
        return geojson_to_geom(obj.get("geometry"))
    if typ == "GeometryCollection":
        raise NotImplementedError("GeometryCollection")
    coords = obj.get("coordinates")
    if coords is None or (isinstance(coords, list) and not coords):
        return None
    if typ == "Point":
        if len(coords) != 2:
            raise NotImplementedError(
                "GeoJSON coordinates beyond (x, y) (altitude/measures)")
        x, y = float(coords[0]), float(coords[1])
        return {"kind": 1, "xs": [x], "ys": [y], "ring_offsets": [0, 1],
                "bbox": {"minx": x, "miny": y, "maxx": x, "maxy": y}}
    if typ == "MultiPoint":
        return _assemble(1, [_coords_xy(coords)])
    if typ == "LineString":
        return _assemble(2, [_coords_xy(coords)])
    if typ == "MultiLineString":
        return _assemble(2, [_coords_xy(p) for p in coords])
    if typ == "Polygon":
        rings = [_norm_ring(*_coords_xy(r), want_ccw=(i == 0))
                 for i, r in enumerate(coords)]
        return _assemble(3 if len(rings) == 1 else 6, rings)
    if typ == "MultiPolygon":
        rings = []
        for poly in coords:
            for i, r in enumerate(poly):
                rings.append(_norm_ring(*_coords_xy(r), want_ccw=(i == 0)))
        return _assemble(3 if len(rings) == 1 else 6, rings)
    raise ValueError(f"unknown GeoJSON type {typ!r}")


# ----------------------------------------------------------- Spark level

def to_geojson(df, geom_col: str = "geom", out_col: str = "geojson"):
    """Append a StringType GeoJSON-geometry column (ST_AsGeoJSON analog)."""
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
            out.append(json.dumps(geom_to_geojson(g), separators=(",", ":")))
        return pd.Series(out, dtype=object)

    g = F.col(geom_col)
    return df.withColumn(
        out_col, _ser(g["kind"], g["xs"], g["ys"], g["ring_offsets"]))


def from_geojson(df, json_col: str = "geojson", out_col: str = "geom"):
    """Append an engine geometry struct parsed from GeoJSON text
    (ST_GeomFromGeoJSON analog)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from spandex_spark.operators.trim import _GEOM_TYPE

    @pandas_udf(_GEOM_TYPE)
    def _de(s: pd.Series) -> pd.DataFrame:
        kinds, xs, ys, offs, bbs = [], [], [], [], []
        for t in s:
            g = geojson_to_geom(t)
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

    out = df.withColumn(out_col, _de(F.col(json_col)))
    return out.withColumn(
        out_col,
        F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))


# ------------------------------------------------------------- file IO

def write_geojson(df, path: str, *, geom_col: str = "geom",
                  id_col: str | None = None) -> None:
    """Write ONE RFC 7946 FeatureCollection. Driver-side by design —
    a single JSON document is an edge format (same contract as
    sources/shapefile.py); non-geometry columns become feature
    properties."""
    rows = df.collect()  # collect-ok: bounded edge-format export (one JSON document)
    feats = []
    for r in rows:
        d = r.asDict(recursive=True)
        g = d.pop(geom_col, None)
        feat = {"type": "Feature",
                "geometry": None if g is None else geom_to_geojson(g),
                "properties": d}
        if id_col is not None and id_col in d:
            feat["id"] = d[id_col]
        feats.append(feat)
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)


def read_geojson(spark, path: str, *, out_col: str = "geom"):
    """Parse a FeatureCollection file into a DataFrame (properties +
    engine geometry struct). Driver-side parse, then createDataFrame —
    bounded edge format, like the shapefile loader."""
    with open(path) as fh:
        doc = json.load(fh)
    if doc.get("type") != "FeatureCollection":
        raise ValueError(f"not a FeatureCollection: {doc.get('type')!r}")
    rows = []
    for feat in doc["features"]:
        props = dict(feat.get("properties") or {})
        props[out_col] = geojson_to_geom(feat.get("geometry"))
        rows.append(props)
    if not rows:
        raise ValueError("empty FeatureCollection")
    import pyspark.sql.types as T
    from spandex_spark.operators.trim import _GEOM_TYPE
    first = rows[0]
    fields = []
    for k, v in first.items():
        if k == out_col:
            fields.append(T.StructField(k, _GEOM_TYPE))
        elif isinstance(v, bool):
            fields.append(T.StructField(k, T.BooleanType()))
        elif isinstance(v, int):
            fields.append(T.StructField(k, T.LongType()))
        elif isinstance(v, float):
            fields.append(T.StructField(k, T.DoubleType()))
        else:
            fields.append(T.StructField(k, T.StringType()))
    schema = T.StructType(fields)
    data = [tuple(r.get(f.name) for f in fields) for r in rows]
    return spark.createDataFrame(data, schema)
