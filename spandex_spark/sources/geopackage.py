"""GeoPackage (OGC 12-128r) vector-feature interop via stdlib sqlite3.

GeoPackage is the SQLite-container exchange format QGIS/GDAL default
to; the reference's users move parcel layers in and out of PostGIS
with it routinely (spandex's io loads whatever GDAL hands it —
SURVEY.md §1.1). Pure stdlib: `sqlite3` for the container, the
engine's own WKB codec (`sources/wkb.py`) for the geometry payload —
no GDAL/fiona, same no-native-deps contract as the shapefile/GeoTIFF
spec IO.

File layout written (the minimum conforming feature GeoPackage):
``PRAGMA application_id = 'GPKG'``, `gpkg_spatial_ref_sys` (EPSG:4326
plus the two mandatory undefined SRS rows), `gpkg_contents` (one
'features' row with the layer bbox), `gpkg_geometry_columns`, and the
feature table itself (`fid INTEGER PRIMARY KEY` + GeoPackage geometry
BLOB + attribute columns).

Geometry BLOB: "GP" magic, version 0, flags (header byte order +
envelope indicator), srs_id, optional envelope, then standard WKB —
the envelope is written ([minx, maxx, miny, maxy] per spec §2.1.3)
and both header byte orders and all envelope indicators are read.

Driver-side by design — a single SQLite file is an edge format (same
contract as write_geojson / the shapefile loader): bounded layers in
and out, then Spark-side from there.
"""

from __future__ import annotations

import sqlite3
import struct

from spandex_spark.sources.wkb import geom_to_wkb, wkb_to_geom

_GPKG_APP_ID = 0x47504B47  # 'GPKG'
_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def _gp_blob(g: dict | None, srs_id: int) -> bytes | None:
    """Engine geometry struct → GeoPackage geometry blob (little-endian
    header, XY envelope)."""
    if g is None:
        return None
    wkb = geom_to_wkb(g)
    bb = g["bbox"]
    flags = 0b00000011  # little-endian header | envelope indicator 1 (XY)
    head = (b"GP" + bytes([0, flags])
            + struct.pack("<i", srs_id)
            + struct.pack("<4d", float(bb["minx"]), float(bb["maxx"]),
                          float(bb["miny"]), float(bb["maxy"])))
    return head + wkb


def _parse_gp_blob(blob: bytes | None) -> dict | None:
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (bad magic)")
    flags = blob[3]
    if flags & 0b100000:
        raise NotImplementedError("extended GeoPackage geometry")
    env = (flags >> 1) & 0b111
    if env not in _ENV_DOUBLES:
        raise ValueError(f"invalid envelope indicator {env}")
    if flags & 0b10000:  # empty-geometry flag
        return None
    off = 8 + 8 * _ENV_DOUBLES[env]
    return wkb_to_geom(bytes(blob[off:]))


def _sql_type(v) -> str:
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "INTEGER"
    if isinstance(v, float):
        return "REAL"
    if isinstance(v, (bytes, bytearray)):
        return "BLOB"
    return "TEXT"


def write_geopackage(df, path: str, *, table: str = "features",
                     geom_col: str = "geom", srs_id: int = 4326,
                     geometry_type: str = "GEOMETRY") -> None:
    """Write one feature layer; non-geometry columns become attribute
    columns. Overwrites ``path``."""
    rows = df.collect()  # collect-ok: bounded edge-format export (one sqlite file)
    import os
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
        con.execute("PRAGMA user_version = 10300")
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER
            NOT NULL, definition TEXT NOT NULL, description TEXT)""")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("WGS 84", 4326, "EPSG", 4326,
              'GEOGCS["WGS 84",DATUM["WGS_1984",'
              'SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
              None),
             ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None)])
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME NOT NULL DEFAULT
            (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        con.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")

        attr_cols = [f.name for f in df.schema.fields if f.name != geom_col]
        # type each column from its first NON-NULL value across all rows
        # (a None in row 0 would otherwise declare TEXT and silently
        # stringify later numerics under SQLite TEXT affinity)
        sample = {}
        for c in attr_cols:
            sample[c] = next(
                (r[c] for r in rows if r[c] is not None), None)
        col_defs = ", ".join(
            f'"{c}" {_sql_type(sample.get(c))}' for c in attr_cols)
        sep = ", " if col_defs else ""
        con.execute(f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY'
                    f' AUTOINCREMENT, "{geom_col}" BLOB{sep}{col_defs})')

        minx = miny = float("inf")
        maxx = maxy = float("-inf")
        ins = (f'INSERT INTO "{table}" ("{geom_col}"'
               + "".join(f', "{c}"' for c in attr_cols) + ") VALUES (?"
               + ", ?" * len(attr_cols) + ")")
        for r in rows:
            d = r.asDict(recursive=True)
            g = d.get(geom_col)
            if g is not None:
                bb = g["bbox"]
                minx = min(minx, bb["minx"]); miny = min(miny, bb["miny"])
                maxx = max(maxx, bb["maxx"]); maxy = max(maxy, bb["maxy"])
            con.execute(ins, [_gp_blob(g, srs_id)]
                        + [d.get(c) for c in attr_cols])
        have_bbox = minx <= maxx
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (table, "features", table,
             minx if have_bbox else None, miny if have_bbox else None,
             maxx if have_bbox else None, maxy if have_bbox else None,
             srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (table, geom_col, geometry_type, srs_id))
        con.commit()
    finally:
        con.close()


def read_geopackage(spark, path: str, *, table: str | None = None,
                    out_col: str = "geom"):
    """Load one feature layer into a DataFrame (attributes + engine
    geometry struct). ``table=None`` picks the single layer registered
    in gpkg_geometry_columns (error if several — name one)."""
    con = sqlite3.connect(path)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        if app_id != _GPKG_APP_ID:
            raise ValueError(f"not a GeoPackage (application_id={app_id})")
        layers = con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns"
        ).fetchall()
        if table is None:
            if len(layers) != 1:
                raise ValueError(
                    f"need table=: {[t for t, _ in layers]}")
            table, gcol = layers[0]
        else:
            match = [c for t, c in layers if t == table]
            if not match:
                raise ValueError(f"no layer {table!r} in {path}")
            gcol = match[0]
        cur = con.execute(f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        rows = []
        for rec in cur.fetchall():
            d = dict(zip(names, rec))
            d.pop("fid", None)
            blob = d.pop(gcol, None)
            d[out_col] = _parse_gp_blob(blob)
            rows.append(d)
    finally:
        con.close()
    if not rows:
        raise ValueError(f"empty layer {table!r}")
    import pyspark.sql.types as T

    from spandex_spark.operators.trim import _GEOM_TYPE
    fields = []
    for k in rows[0]:
        # first NON-NULL value across the layer decides the type (a NULL
        # attribute in feature 0 must not mistype the whole column)
        v = next((r[k] for r in rows if r[k] is not None), None)
        if k == out_col:
            fields.append(T.StructField(k, _GEOM_TYPE))
        elif isinstance(v, bool):
            fields.append(T.StructField(k, T.BooleanType()))
        elif isinstance(v, int):
            fields.append(T.StructField(k, T.LongType()))
        elif isinstance(v, float):
            fields.append(T.StructField(k, T.DoubleType()))
        elif isinstance(v, (bytes, bytearray)):
            fields.append(T.StructField(k, T.BinaryType()))
        else:
            fields.append(T.StructField(k, T.StringType()))
    return spark.createDataFrame(rows, T.StructType(fields))
