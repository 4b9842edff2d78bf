"""Mapbox Vector Tile (MVT 2.1) encoder/decoder — from the public spec.

Reference semantics: the north star names "a spatial-join + TILING
engine" (BASELINE.json:6); MVT is the de-facto wire format a tiling
engine SERVES — every slippy-map client (Mapbox GL, MapLibre, OpenLayers,
QGIS) consumes z/x/y.mvt blobs.  This module implements the Mapbox
Vector Tile spec v2.1 (github.com/mapbox/vector-tile-spec — an open
spec, CC-BY 3.0) the same way sources/shapefile.py and sources/geotiff.py
implement their specs: pure-python byte packing, writer AND reader, so
round-trip tests preclude compensating bugs.  No protobuf library is
used — MVT's .proto compiles to a small, stable wire layout (varints,
length-delimited submessages, packed uint32 geometries) that is encoded
directly.

Wire layout encoded here (spec §4.1, vector_tile.proto):

* Tile: ``layers`` = field 3 (length-delimited).
* Layer: ``version``=15 (varint, MUST be 2), ``name``=1 (string),
  ``features``=2 (repeated message), ``keys``=3 (repeated string),
  ``values``=4 (repeated Value), ``extent``=5 (varint, default 4096).
* Feature: ``id``=1 (varint), ``tags``=2 (packed varint key/value index
  pairs), ``type``=3 (varint: 1=POINT 2=LINESTRING 3=POLYGON),
  ``geometry``=4 (packed uint32 command stream).
* Value (oneof): string=1, float=2 (32-bit), double=3 (64-bit),
  int=4 (varint), uint=5 (varint), sint=6 (zigzag), bool=7 (varint).
* Geometry commands (spec §4.3.3): CommandInteger =
  ``(command_id & 0x7) | (count << 3)`` with MoveTo=1 LineTo=2
  ClosePath=7; parameters are zigzag-encoded int32 DELTAS from the
  cursor, in tile-local coordinates (y grows DOWN, origin top-left).
* Polygon winding (spec §4.3.4.4): in the y-down tile grid the exterior
  ring's surveyor's-formula area MUST be > 0 and interior rings < 0;
  the encoder enforces this by reversing rings as needed.

Scale shape: encoding is per-tile-group work behind ONE shuffle on the
tile key (see render_mvt_tiles) — blob size is bounded by the extent
quantization, never by corpus size, so a 10^12-row corpus renders as
(occupied tiles) independent small jobs.
"""

from __future__ import annotations

import struct
from typing import Iterator

# GeomType enum (spec §4.3.4)
POINT, LINESTRING, POLYGON = 1, 2, 3
_MOVE_TO, _LINE_TO, _CLOSE_PATH = 1, 2, 7


# ---------------------------------------------------------------- wire
def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint must be unsigned; zigzag first")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf buffer.
    Length-delimited values come back as bytes; varints as int;
    fixed32/64 as raw bytes for the caller to unpack."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            v = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            v = buf[pos:pos + 8]
            pos += 8
        else:  # pragma: no cover - groups are not in the MVT proto
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# ---------------------------------------------------------------- values
def _encode_value(v) -> bytes:
    """Value oneof per spec §4.1; bool before int (bool is an int subclass)."""
    if isinstance(v, bool):
        return _key(7, 0) + _varint(int(v))
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _len_delim(1, b)
    if isinstance(v, int):
        return _key(6, 0) + _varint(_zigzag(v))  # sint: negatives stay short
    if isinstance(v, float):
        return _key(3, 1) + struct.pack("<d", v)
    raise TypeError(f"unsupported MVT property type {type(v).__name__}")


def _decode_value(buf: bytes):
    for field, wire, v in _fields(buf):
        if field == 1:
            return v.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field in (4, 5):
            return v
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    return None


# ---------------------------------------------------------------- geometry
def _ring_area2(pts: list[tuple[int, int]]) -> int:
    """Twice the surveyor's-formula area in tile coords (y-down)."""
    a = 0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        a += x0 * y1 - x1 * y0
    return a


def _encode_geometry(gtype: int, parts: list[list[tuple[int, int]]]) -> list[int]:
    """Command stream for one feature.  ``parts``: for POINT one part of
    n points; LINESTRING one part per line; POLYGON one part per ring
    (first exterior, rest holes — winding is normalized here).  Rings
    must NOT repeat the first point (ClosePath implies it)."""
    cmds: list[int] = []
    cx = cy = 0

    def moves(pts, count_hdr):
        nonlocal cx, cy
        cmds.append(count_hdr)
        for x, y in pts:
            cmds.append(_zigzag(x - cx))
            cmds.append(_zigzag(y - cy))
            cx, cy = x, y

    if gtype == POINT:
        (pts,) = parts
        moves(pts, (_MOVE_TO & 0x7) | (len(pts) << 3))
    elif gtype == LINESTRING:
        for pts in parts:
            if len(pts) < 2:
                raise ValueError("linestring part needs >= 2 points")
            moves(pts[:1], (_MOVE_TO & 0x7) | (1 << 3))
            moves(pts[1:], (_LINE_TO & 0x7) | ((len(pts) - 1) << 3))
    elif gtype == POLYGON:
        for i, pts in enumerate(parts):
            if len(pts) < 3:
                raise ValueError("polygon ring needs >= 3 points")
            if pts[0] == pts[-1]:
                pts = pts[:-1]
            a2 = _ring_area2(pts)
            want_pos = i == 0  # spec §4.3.4.4: exterior > 0, interior < 0
            if (a2 > 0) != want_pos:
                pts = pts[:1] + pts[1:][::-1]
            moves(pts[:1], (_MOVE_TO & 0x7) | (1 << 3))
            moves(pts[1:], (_LINE_TO & 0x7) | ((len(pts) - 1) << 3))
            cmds.append((_CLOSE_PATH & 0x7) | (1 << 3))
    else:
        raise ValueError(f"unknown geometry type {gtype}")
    return cmds


def _decode_geometry(gtype: int, cmds: list[int]) -> list[list[tuple[int, int]]]:
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cid, count = cmds[i] & 0x7, cmds[i] >> 3
        i += 1
        if cid == _MOVE_TO:
            if gtype != POINT and cur:
                parts.append(cur)
                cur = []
            for _ in range(count):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cid == _LINE_TO:
            for _ in range(count):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cid == _CLOSE_PATH:
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"unknown command id {cid}")
    if cur:
        parts.append(cur)
    return parts


# ---------------------------------------------------------------- layers
def encode_layer(name: str, features: list[dict], *,
                 extent: int = 4096) -> bytes:
    """One Layer message.  Each feature dict: ``{"id": int, "type":
    POINT|LINESTRING|POLYGON, "parts": [[(x,y),...],...],
    "props": {str: str|int|float|bool}}`` with tile-local integer
    coordinates in [0, extent).  Keys/values are layer-interned per
    spec §4.4 (tags are index pairs into the layer dictionaries)."""
    keys: list[str] = []
    key_ix: dict[str, int] = {}
    vals: list[bytes] = []
    val_ix: dict[bytes, int] = {}
    feat_msgs: list[bytes] = []
    for f in features:
        tags: list[int] = []
        for k, v in f.get("props", {}).items():
            if v is None:
                continue
            if k not in key_ix:
                key_ix[k] = len(keys)
                keys.append(k)
            vb = _encode_value(v)
            if vb not in val_ix:
                val_ix[vb] = len(vals)
                vals.append(vb)
            tags.append(key_ix[k])
            tags.append(val_ix[vb])
        body = bytearray()
        if f.get("id") is not None:
            body += _key(1, 0) + _varint(int(f["id"]))
        if tags:
            tb = b"".join(_varint(t) for t in tags)
            body += _len_delim(2, tb)
        body += _key(3, 0) + _varint(f["type"])
        gb = b"".join(_varint(c) for c in
                      _encode_geometry(f["type"], f["parts"]))
        body += _len_delim(4, gb)
        feat_msgs.append(bytes(body))
    layer = bytearray()
    layer += _key(15, 0) + _varint(2)          # version MUST be 2
    layer += _len_delim(1, name.encode("utf-8"))
    for m in feat_msgs:
        layer += _len_delim(2, m)
    for k in keys:
        layer += _len_delim(3, k.encode("utf-8"))
    for vb in vals:
        layer += _len_delim(4, vb)
    layer += _key(5, 0) + _varint(extent)
    return bytes(layer)


def encode_tile(layers: list[tuple[str, list[dict]]], *,
                extent: int = 4096) -> bytes:
    """A full .mvt blob: repeated Layer in field 3 of Tile."""
    return b"".join(_len_delim(3, encode_layer(n, fs, extent=extent))
                    for n, fs in layers)


def decode_tile(blob: bytes) -> list[dict]:
    """Inverse of encode_tile: list of layer dicts with ``name``,
    ``extent``, ``version`` and ``features`` (same shape encode_layer
    takes, with ``props`` reconstructed from the tag dictionaries)."""
    layers = []
    for field, _, v in _fields(blob):
        if field != 3:
            continue
        name, extent, version = "", 4096, 0
        keys: list[str] = []
        vals: list = []
        raw_feats: list[bytes] = []
        for lf, _, lv in _fields(v):
            if lf == 15:
                version = lv
            elif lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                vals.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
        feats = []
        for fb in raw_feats:
            fid, ftype, tags, cmds = None, 0, [], []
            for ff, fw, fv in _fields(fb):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    p = 0
                    while p < len(fv):
                        t, p = _read_varint(fv, p)
                        tags.append(t)
                elif ff == 3:
                    ftype = fv
                elif ff == 4:
                    p = 0
                    while p < len(fv):
                        c, p = _read_varint(fv, p)
                        cmds.append(c)
            props = {keys[tags[i]]: vals[tags[i + 1]]
                     for i in range(0, len(tags), 2)}
            feats.append({"id": fid, "type": ftype,
                          "parts": _decode_geometry(ftype, cmds),
                          "props": props})
        layers.append({"name": name, "extent": extent,
                       "version": version, "features": feats})
    return layers
