"""O9 — shapefile bulk load, pure numpy, no GDAL.

Reference semantics: spandex/io.py loads ESRI shapefiles into PostGIS
(shp2pgsql / GDAL based). This environment has no GDAL, but the shapefile
format is a public, stable spec (ESRI Shapefile Technical Description,
July 1998), simple enough to parse directly: a 100-byte big/little-endian
mixed header, then length-prefixed records of (shape type, bbox, parts,
points). This module implements the subset the engine's geometry model
covers — Point (1), PolyLine (3), Polygon (5), MultiPoint (8) — plus the
companion .shx index and a minimal dBase III .dbf for one numeric id
column, both directions (writer exists so round-trips are testable
without binary fixtures).

Ring conventions differ and are converted on the fly: shapefiles store
CLOSED rings with OUTER CLOCKWISE / holes counter-clockwise; the engine
stores OPEN rings with outer CCW / holes CW.

Scale shape: one .shp is parsed on the driver (vectorized numpy over the
raw buffer) and handed to Spark via createDataFrame — shapefiles are a
bounded-size EDGE format (the spec caps a file at 2 GB); the 100 TB path
stores geometry in Parquet (tables.py) and uses this only for ingest.
Record offsets come from .shx, so a huge file COULD be range-partitioned
across executors; not needed at the sizes the format allows.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_GEOM_SCHEMA = ("id long, geom struct<kind:tinyint, xs:array<double>, "
                "ys:array<double>, ring_offsets:array<int>, "
                "bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def write_shapefile(path: str, rows: list) -> None:
    """Write [(id, geom_dict), ...] as .shp/.shx/.dbf. ``geom_dict`` uses
    the engine encoding (kind 1=point, 2=line, 3/6=polygon)."""
    recs = []
    gminx = gminy = float("inf")
    gmaxx = gmaxy = float("-inf")
    stype_file = None
    for _id, g in rows:
        kind = int(g["kind"])
        xs = np.asarray(g["xs"], np.float64)
        ys = np.asarray(g["ys"], np.float64)
        offs = g.get("ring_offsets")
        offs = (np.asarray(offs, np.int64)
                if offs is not None and len(offs) > 2 else
                np.array([0, xs.shape[0]], np.int64))
        if kind == 1:
            stype = 1
            content = struct.pack("<idd", 1, float(xs[0]), float(ys[0]))
        else:
            stype = 3 if kind == 2 else 5
            parts_x, parts_y = [], []
            for r in range(offs.shape[0] - 1):
                rx = xs[offs[r]:offs[r + 1]]
                ry = ys[offs[r]:offs[r + 1]]
                if stype == 5:
                    # engine: CCW outer / CW hole, OPEN. Shapefile: CW
                    # outer / CCW hole, CLOSED → reverse every ring
                    # (preserves the outer/hole distinction) and close it.
                    rx, ry = rx[::-1], ry[::-1]
                    rx = np.append(rx, rx[0])
                    ry = np.append(ry, ry[0])
                parts_x.append(rx)
                parts_y.append(ry)
            counts = [p.shape[0] for p in parts_x]
            starts = np.cumsum([0] + counts[:-1])
            ax = np.concatenate(parts_x)
            ay = np.concatenate(parts_y)
            content = struct.pack(
                "<iddddii", stype, float(ax.min()), float(ay.min()),
                float(ax.max()), float(ay.max()), len(counts), ax.shape[0])
            content += np.asarray(starts, "<i4").tobytes()
            content += np.column_stack([ax, ay]).astype("<f8").tobytes()
        stype_file = stype if stype_file is None else stype_file
        if stype_file != stype:
            raise ValueError("shapefile holds a single shape type")
        recs.append((int(_id), content))
        bx = g["bbox"]
        gminx, gminy = min(gminx, bx["minx"]), min(gminy, bx["miny"])
        gmaxx, gmaxy = max(gmaxx, bx["maxx"]), max(gmaxy, bx["maxy"])

    def header(total_words):
        return (struct.pack(">i20xi", 9994, total_words)
                + struct.pack("<ii", 1000, stype_file or 0)
                + struct.pack("<8d", gminx, gminy, gmaxx, gmaxy, 0, 0, 0, 0))

    shp_body = b""
    shx_body = b""
    off_words = 50
    for i, (_id, content) in enumerate(recs):
        clen = len(content) // 2
        shp_body += struct.pack(">ii", i + 1, clen) + content
        shx_body += struct.pack(">ii", off_words, clen)
        off_words += 4 + clen
    with open(path + ".shp", "wb") as fh:
        fh.write(header(off_words) + shp_body)
    with open(path + ".shx", "wb") as fh:
        fh.write(header(50 + 4 * len(recs)) + shx_body)
    # dBase III: one numeric field "ID", width 18
    n = len(recs)
    dbf_hdr = struct.pack("<B3BIHH20x", 3, 26, 8, 17, n, 33 + 32, 1 + 18)
    fld = b"ID" + b"\x00" * 9 + b"N" + b"\x00" * 4 + bytes([18, 0]) + b"\x00" * 14
    body = b"".join(b" " + str(_id).rjust(18).encode()
                    for _id, _ in recs)
    with open(path + ".dbf", "wb") as fh:
        fh.write(dbf_hdr + fld + b"\x0d" + body + b"\x1a")


def read_shapefile(spark, path: str):
    """Parse .shp (+ .dbf id column) into a DataFrame in the engine's
    geometry encoding. Supports shape types 1/3/5/8 (+0 null)."""
    with open(path + ".shp", "rb") as fh:
        buf = fh.read()
    (code,) = struct.unpack(">i", buf[:4])
    if code != 9994:
        raise ValueError(f"not a shapefile: magic {code}")
    ids = _read_dbf_ids(path + ".dbf")
    rows = []
    pos = 100
    rec_i = 0
    while pos < len(buf):
        _, clen = struct.unpack(">ii", buf[pos:pos + 8])
        pos += 8
        content = buf[pos:pos + clen * 2]
        pos += clen * 2
        (stype,) = struct.unpack("<i", content[:4])
        _id = ids[rec_i] if rec_i < len(ids) else rec_i
        rec_i += 1
        if stype == 0:
            rows.append((_id, None))
            continue
        if stype == 1:
            x, y = struct.unpack("<dd", content[4:20])
            rows.append((_id, {"kind": 1, "xs": [x], "ys": [y],
                               "ring_offsets": [0, 1],
                               "bbox": {"minx": x, "miny": y,
                                        "maxx": x, "maxy": y}}))
            continue
        if stype == 8:
            (npts,) = struct.unpack("<i", content[36:40])
            pts = np.frombuffer(content, "<f8", 2 * npts, 40).reshape(-1, 2)
            xs, ys = pts[:, 0], pts[:, 1]
            rows.append((_id, {"kind": 1, "xs": xs.tolist(), "ys": ys.tolist(),
                               "ring_offsets": [0, int(npts)],
                               "bbox": {"minx": float(xs.min()),
                                        "miny": float(ys.min()),
                                        "maxx": float(xs.max()),
                                        "maxy": float(ys.max())}}))
            continue
        if stype not in (3, 5):
            raise NotImplementedError(f"shape type {stype}")
        nparts, npts = struct.unpack("<ii", content[36:44])
        starts = np.frombuffer(content, "<i4", nparts, 44)
        pts = np.frombuffer(content, "<f8", 2 * npts,
                            44 + 4 * nparts).reshape(-1, 2)
        out_x, out_y, offs = [], [], [0]
        bounds = np.append(starts, npts)
        for r in range(nparts):
            rx = pts[bounds[r]:bounds[r + 1], 0]
            ry = pts[bounds[r]:bounds[r + 1], 1]
            if stype == 5:
                if rx.shape[0] > 1 and rx[0] == rx[-1] and ry[0] == ry[-1]:
                    rx, ry = rx[:-1], ry[:-1]
                rx, ry = rx[::-1], ry[::-1]  # CW outer → CCW engine outer
            out_x.append(rx)
            out_y.append(ry)
            offs.append(offs[-1] + rx.shape[0])
        ax = np.concatenate(out_x)
        ay = np.concatenate(out_y)
        kind = 2 if stype == 3 else (3 if nparts == 1 else 6)
        rows.append((_id, {"kind": kind, "xs": ax.tolist(), "ys": ay.tolist(),
                           "ring_offsets": [int(v) for v in offs],
                           "bbox": {"minx": float(ax.min()),
                                    "miny": float(ay.min()),
                                    "maxx": float(ax.max()),
                                    "maxy": float(ay.max())}}))
    return spark.createDataFrame(rows, _GEOM_SCHEMA)


def _read_dbf_ids(path: str) -> list:
    if not os.path.exists(path):
        return []
    with open(path, "rb") as fh:
        buf = fh.read()
    n, hdr_len, rec_len = struct.unpack("<IHH", buf[4:12])
    out = []
    pos = hdr_len
    for _ in range(n):
        rec = buf[pos:pos + rec_len]
        pos += rec_len
        try:
            out.append(int(rec[1:].decode().strip() or 0))
        except ValueError:
            out.append(0)
    return out
