"""O7 ingest — GeoTIFF raster load, pure numpy, no GDAL/rasterio.

Reference semantics: spandex/rastertoolz.py::from_geotiff (rasterio
based). The environment has no raster libs, but baseline (uncompressed,
stripped) TIFF 6.0 + the GeoTIFF georeferencing tags are public specs
simple enough to parse directly: a byte-order header, a chain of IFDs
holding (tag, type, count, value) entries, strip offsets for the pixel
matrix, and GeoTIFF's ModelPixelScale (33550) + ModelTiepoint (33922)
tags mapping raster (col, row) to (lon, lat).

Supported: single-band, stripped OR tiled (TileWidth/TileLength — the
cloud-optimized-GeoTIFF layout), sample formats uint8/16/32, int8/16/32,
float32/64, either byte order; Compression = none (1), LZW (5, TIFF
variant: MSB-first codes, 9-bit start, early-change width bumps, Clear at
table-full — decoder AND encoder implemented from the public TIFF 6.0
spec §13), or Deflate (8 / legacy 32946, stdlib zlib); Predictor 2
(horizontal differencing) honored on read. The writer emits the same
subset so round-trips are testable without binary fixtures; byte-level
spec assertions in tests/test_geotiff.py keep the pair honest.

Output is the engine's raster TILE TABLE (tile_id, x0, y0, res, nx, ny,
values row-major ascending-latitude) — the reader retiles a big image
into ``tile_rows`` × ``tile_cols`` chunks so one GeoTIFF fans out across
executors; zonal_stats/clip_raster/downsample consume it unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TIFF_TYPES = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
               11: ("f", 4), 12: ("d", 8)}

_CLEAR, _EOI, _FIRST = 256, 257, 258


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, 9-bit initial
    codes, EARLY code-width change (width bumps when the next free code
    reaches 2^w - 1, one code before the table actually needs it), Clear
    emitted when the table hits 4094."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # keep acc small — unbounded ints go O(n^2)

    table = {bytes([i]): i for i in range(256)}
    nxt, width = _FIRST, 9
    emit(_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        w = c
        if nxt >= 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = _FIRST, 9
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """Inverse of lzw_encode — same early-change TIFF conventions."""
    out = bytearray()
    table: list = []
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream without EOI: tolerate
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1  # keep acc small — unbounded ints go O(n^2)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table")
        out += entry
        # early change, decoder side: the table lags the encoder's next
        # free code by ONE (the first code after Clear appends nothing),
        # so the width bump lands at 2^w - 2 where the encoder used 2^w - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry


def packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (spec §9, the Apple RLE): control byte n as signed —
    0..127 copies n+1 literals, -1..-127 repeats the next byte 1-n times,
    -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += data[i:i + 1] * (257 - c)
            i += 1
        # 128 → no-op
    return bytes(out)


def packbits_encode(data: bytes, row_bytes: int | None = None) -> bytes:
    """PackBits encoder. The spec requires each ROW compressed
    independently (so any row is decodable alone); pass ``row_bytes`` to
    honor that — without it the whole buffer is one stream (still decodes
    fine through packbits_decode and libtiff-style strip-at-once readers)."""
    if row_bytes:
        return b"".join(packbits_encode(data[i:i + row_bytes])
                        for i in range(0, len(data), row_bytes))
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal stretch: until a run of >= 3 starts (2-byte runs aren't
        # worth breaking a literal for) or 128 bytes
        lit = i
        while (j < n and j - lit < 128
               and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])):
            j += 1
        j = min(j, lit + 128, n)
        out += bytes([j - lit - 1]) + data[lit:j]
        i = j
    return bytes(out)


def _decompress_strip(raw: bytes, comp: int) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):          # Adobe Deflate / legacy Deflate
        return zlib.decompress(raw)
    if comp == 5:                   # LZW
        return lzw_decode(raw)
    if comp == 32773:               # PackBits
        return packbits_decode(raw)
    raise NotImplementedError(f"compression {comp}"
                              " (supported: 1 none, 5 LZW, 8/32946 deflate,"
                              " 32773 PackBits)")


def _compress_strip(raw: bytes, compression: str,
                    row_bytes: int | None = None) -> tuple[bytes, int]:
    if compression == "none":
        return raw, 1
    if compression == "deflate":
        return zlib.compress(raw, 6), 8
    if compression == "lzw":
        return lzw_encode(raw), 5
    if compression == "packbits":
        return packbits_encode(raw, row_bytes), 32773
    raise ValueError(f"unknown compression {compression!r}"
                     " (none | deflate | lzw | packbits)")


def write_geotiff(path: str, arr: np.ndarray, *, x0: float, y0: float,
                  res: float, compression: str = "none",
                  res_y: float | None = None,
                  tile: tuple[int, int] | None = None,
                  planar: bool = False) -> None:
    """Write a float64 GeoTIFF (little-endian; ``compression``: 'none' |
    'deflate' | 'lzw' | 'packbits'). ``arr`` is row-major with row 0 at the TOP (max
    latitude), per TIFF convention; (x0, y0) is the lower-left corner of
    the covered box.

    Beyond the classic single-band one-strip layout:

    * ``arr`` of shape (spp, ny, nx) writes a MULTI-BAND file
      (SamplesPerPixel=spp) — chunky (PlanarConfiguration 1, samples
      interleaved per pixel) by default, one plane per band with
      ``planar=True``;
    * ``tile=(tw, th)`` writes the TILED layout (TIFF 6.0 §15, the
      cloud-optimized-GeoTIFF shape; edge tiles zero-padded to full
      tw×th);
    * ``res_y`` writes an ANISOTROPIC ModelPixelScale (sy != sx — common
      on real satellite products); defaults to ``res``.

    The single-band / strip / square default path is byte-stable (the
    spec tests assert its exact layout)."""
    arr = np.asarray(arr, np.float64)
    if arr.ndim == 3 or tile is not None or res_y is not None:
        _write_geotiff_general(path, arr, x0=x0, y0=y0, res=res,
                               compression=compression, res_y=res_y,
                               tile=tile, planar=planar)
        return
    ny, nx = arr.shape
    data, comp_tag = _compress_strip(arr.astype("<f8").tobytes(), compression,
                                     row_bytes=nx * 8)
    # layout: 8-byte header | pixel data | IFD | out-of-line tag values
    data_off = 8
    ifd_off = data_off + len(data)
    entries = [
        (256, 4, 1, nx),             # ImageWidth
        (257, 4, 1, ny),             # ImageLength
        (258, 3, 1, 64),             # BitsPerSample
        (259, 3, 1, comp_tag),       # Compression
        (273, 4, 1, data_off),       # StripOffsets
        (278, 4, 1, ny),             # RowsPerStrip
        (279, 4, 1, len(data)),      # StripByteCounts
        (339, 3, 1, 3),              # SampleFormat = IEEE float
        (33550, 12, 3, None),        # ModelPixelScale (out-of-line)
        (33922, 12, 6, None),        # ModelTiepoint (out-of-line)
    ]
    tail_off = ifd_off + 2 + len(entries) * 12 + 4
    scale_off = tail_off
    tie_off = scale_off + 3 * 8
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += data
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if tag == 33550:
            out += struct.pack("<I", scale_off)
        elif tag == 33922:
            out += struct.pack("<I", tie_off)
        elif typ == 3:
            out += struct.pack("<HH", value, 0)
        else:
            out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<3d", res, res, 0.0)
    # tiepoint: raster (0,0) [top-left] ↦ model (x0, y0 + ny*res)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0 + ny * res, 0.0)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _write_geotiff_general(path: str, arr: np.ndarray, *, x0: float,
                           y0: float, res: float, compression: str,
                           res_y: float | None,
                           tile: tuple[int, int] | None,
                           planar: bool) -> None:
    """Multi-band / tiled / anisotropic float64 writer (see write_geotiff)."""
    bands = arr if arr.ndim == 3 else arr[None]
    spp = bands.shape[0]
    ny, nx = bands.shape[1], bands.shape[2]
    ry = res if res_y is None else float(res_y)
    pcfg = 2 if (planar and spp > 1) else 1

    def _pad_tile(src: np.ndarray, th: int, tw: int) -> np.ndarray:
        t = np.zeros((th, tw) + src.shape[2:], np.float64)
        t[:src.shape[0], :src.shape[1]] = src
        return t

    blobs: list[bytes] = []
    comp_tag = 1
    if tile is not None:
        tw, th = int(tile[0]), int(tile[1])
        tiles_across = (nx + tw - 1) // tw
        tiles_down = (ny + th - 1) // th
        if pcfg == 1:
            src = np.stack(bands, axis=-1) if spp > 1 else bands[0]
            for tr in range(tiles_down):
                for tc in range(tiles_across):
                    t = _pad_tile(src[tr * th:tr * th + th,
                                      tc * tw:tc * tw + tw], th, tw)
                    blob, comp_tag = _compress_strip(
                        t.astype("<f8").tobytes(), compression,
                        row_bytes=tw * spp * 8)
                    blobs.append(blob)
        else:
            for b in bands:
                for tr in range(tiles_down):
                    for tc in range(tiles_across):
                        t = _pad_tile(b[tr * th:tr * th + th,
                                        tc * tw:tc * tw + tw], th, tw)
                        blob, comp_tag = _compress_strip(
                            t.astype("<f8").tobytes(), compression,
                            row_bytes=tw * 8)
                        blobs.append(blob)
    else:
        if pcfg == 1:
            src = np.stack(bands, axis=-1) if spp > 1 else bands[0]
            blob, comp_tag = _compress_strip(
                src.astype("<f8").tobytes(), compression,
                row_bytes=nx * spp * 8)
            blobs.append(blob)
        else:
            for b in bands:
                blob, comp_tag = _compress_strip(
                    b.astype("<f8").tobytes(), compression, row_bytes=nx * 8)
                blobs.append(blob)
    n = len(blobs)
    offs, pos = [], 8
    for b in blobs:
        offs.append(pos)
        pos += len(b)
    data = b"".join(blobs)

    entries = [(256, 4, 1, nx), (257, 4, 1, ny), (258, 3, spp, None),
               (259, 3, 1, comp_tag), (277, 3, 1, spp)]
    if tile is not None:
        entries += [(322, 4, 1, tw), (323, 4, 1, th),
                    (324, 4, n, None), (325, 4, n, None)]
    else:
        entries += [(273, 4, n, None), (278, 4, 1, ny), (279, 4, n, None)]
    entries += [(284, 3, 1, pcfg), (339, 3, 1, 3),
                (33550, 12, 3, None), (33922, 12, 6, None)]
    entries.sort()
    strip_tags = (324, 325) if tile is not None else (273, 279)
    ifd_off = 8 + len(data)
    tail = ifd_off + 2 + len(entries) * 12 + 4
    t_off: dict[int, int] = {}
    pos2 = tail
    if spp > 2:
        t_off[258] = pos2
        pos2 += 2 * spp
    if n > 1:
        for tg in strip_tags:
            t_off[tg] = pos2
            pos2 += 4 * n
    t_off[33550] = pos2
    t_off[33922] = pos2 + 24
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off)) + data
    out += struct.pack("<H", len(entries))
    counts_arr = [len(b) for b in blobs]
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if tag == 258:
            if spp > 2:
                out += struct.pack("<I", t_off[258])
            elif spp == 2:
                out += struct.pack("<HH", 64, 64)
            else:
                out += struct.pack("<HH", 64, 0)
        elif tag in strip_tags and n == 1:
            out += struct.pack(
                "<I", offs[0] if tag in (273, 324) else counts_arr[0])
        elif tag in t_off:
            out += struct.pack("<I", t_off[tag])
        elif typ == 3:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)
    if spp > 2:
        out += struct.pack(f"<{spp}H", *([64] * spp))
    if n > 1:
        out += struct.pack(f"<{n}I", *offs)
        out += struct.pack(f"<{n}I", *counts_arr)
    out += struct.pack("<3d", res, ry, 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0 + ny * ry, 0.0)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _read_ifd(buf: bytes, bo: str):
    """Parse the first IFD — classic TIFF (magic 42: 2-byte entry count,
    12-byte entries, 4-byte offsets) or BigTIFF (magic 43, the >4 GB
    format real satellite mosaics ship in: 8-byte entry count, 20-byte
    entries, 8-byte offsets, LONG8/SLONG8/IFD8 value types)."""
    (magic,) = struct.unpack(bo + "H", buf[2:4])
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
        (n,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
        ent0, ent_sz, inline = ifd_off + 2, 12, 4
    elif magic == 43:
        big = True
        offsize, zero = struct.unpack(bo + "HH", buf[4:8])
        if offsize != 8 or zero != 0:
            raise NotImplementedError(
                f"BigTIFF offset size {offsize} (spec fixes it at 8)")
        (ifd_off,) = struct.unpack(bo + "Q", buf[8:16])
        (n,) = struct.unpack(bo + "Q", buf[ifd_off:ifd_off + 8])
        ent0, ent_sz, inline = ifd_off + 8, 20, 8
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    types = dict(_TIFF_TYPES)
    if big:
        types.update({16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8)})
    tags = {}
    for i in range(n):
        e = ent0 + i * ent_sz
        if big:
            tag, typ = struct.unpack(bo + "HH", buf[e:e + 4])
            (count,) = struct.unpack(bo + "Q", buf[e + 4:e + 12])
        else:
            tag, typ, count = struct.unpack(bo + "HHI", buf[e:e + 8])
        fmt, size = types.get(typ, (None, None))
        if fmt is None:
            continue
        total = size * count
        vpos = e + ent_sz - inline
        if total <= inline:
            raw = buf[vpos:vpos + total]
        else:
            (off,) = struct.unpack(bo + ("Q" if big else "I"),
                                   buf[vpos:vpos + inline])
            raw = buf[off:off + total]
        vals = struct.unpack(bo + fmt * count, raw)
        tags[tag] = vals
    return tags


def read_geotiff(spark, path: str, *, tile_rows: int = 256,
                 tile_cols: int = 256, band: int = 0):
    """Parse a GeoTIFF into the raster tile table. The pixel matrix is
    decoded driver-side (one vectorized frombuffer per strip/tile) and
    re-tiled so downstream zonal/clip work distributes.

    Multi-band images (SamplesPerPixel > 1): ``band`` selects ONE band,
    in either chunky (PlanarConfiguration 1 — samples interleaved per
    pixel) or planar (2 — one plane of strips per band) layout; the tile
    table stays single-valued, one read per band of interest."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(buf, bo)
    nx = tags[256][0]
    ny = tags[257][0]
    bits = tags.get(258, (64,))[0]
    comp = tags.get(259, (1,))[0]
    spp = tags.get(277, (1,))[0]
    pcfg = tags.get(284, (1,))[0]
    if not 0 <= band < spp:
        raise ValueError(f"band {band} out of range (SamplesPerPixel={spp})")
    if spp > 1:
        if len(set(tags.get(258, (64,)))) > 1:
            raise NotImplementedError("heterogeneous BitsPerSample per band")
        if pcfg not in (1, 2):
            raise NotImplementedError(f"PlanarConfiguration {pcfg}")
    predictor = tags.get(317, (1,))[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor}"
                                  " (1 none / 2 horizontal only)")
    if predictor == 2 and spp > 1:
        raise NotImplementedError("predictor 2 with SamplesPerPixel > 1")
    sfmt = tags.get(339, (1,))[0]
    dt = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
          (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
          (3, 32): "f4", (3, 64): "f8"}.get((sfmt, bits))
    if dt is None:
        raise NotImplementedError(f"sample format {sfmt}/{bits}")
    if predictor == 2 and sfmt == 3:
        raise NotImplementedError("predictor 2 on float samples")
    dtype = np.dtype(bo + dt)
    if 322 in tags:
        # TILED layout (TIFF 6.0 §15 — the cloud-optimized-GeoTIFF shape):
        # the image is covered by ceil(nx/tw) x ceil(ny/th) tiles, stored
        # left-to-right top-to-bottom, each FULL tw x th (edge tiles padded)
        tw, th = tags[322][0], tags[323][0]
        offsets, counts = tags[324], tags[325]
        tiles_across = (nx + tw - 1) // tw
        tiles_down = (ny + th - 1) // th
        if spp > 1 and pcfg == 2:
            # planar: tiles come plane-by-plane — keep only this band's
            per_plane = tiles_across * tiles_down
            sel = slice(band * per_plane, (band + 1) * per_plane)
            offsets, counts = offsets[sel], counts[sel]
        arr = np.empty((ny, nx), np.float64)
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            raw = _decompress_strip(bytes(buf[o:o + c]), comp)
            if spp > 1 and pcfg == 1:
                # chunky: samples interleaved per pixel — slice the band
                t = np.frombuffer(raw, dtype,
                                  tw * th * spp).reshape(-1, spp)[:, band]
            else:
                t = np.frombuffer(raw, dtype, tw * th)
            if predictor == 2:
                t = t.reshape(th, tw).cumsum(axis=1, dtype=dtype)
            t = np.asarray(t, np.float64).reshape(th, tw)
            r0 = (ti // tiles_across) * th
            c0 = (ti % tiles_across) * tw
            h = min(th, ny - r0)
            w = min(tw, nx - c0)
            arr[r0:r0 + h, c0:c0 + w] = t[:h, :w]
    else:
        offsets = tags[273]
        counts = tags[279]
        if spp > 1 and pcfg == 2:
            # planar: strips come plane-by-plane — keep only this band's
            strips_per_plane = len(offsets) // spp
            sel = slice(band * strips_per_plane, (band + 1) * strips_per_plane)
            offsets, counts = offsets[sel], counts[sel]
        parts = []
        for si, (o, c) in enumerate(zip(offsets, counts)):
            raw = _decompress_strip(bytes(buf[o:o + c]), comp)
            strip = np.frombuffer(raw, dtype, len(raw) // dtype.itemsize)
            if spp > 1 and pcfg == 1:
                # chunky: samples interleaved per pixel — slice the band
                strip = strip.reshape(-1, spp)[:, band]
            if predictor == 2:
                # horizontal differencing: each sample stored as the delta
                # to its left neighbour; undo with a per-row modular cumsum
                nrows = strip.shape[0] // nx
                strip = (strip.reshape(nrows, nx)
                         .cumsum(axis=1, dtype=dtype).ravel())
            parts.append(strip)
        arr = np.concatenate(parts).astype(np.float64).reshape(ny, nx)
    sx, sy = tags[33550][0], tags[33550][1]
    tp = tags[33922]
    # model coords of raster top-left pixel corner
    top_x = tp[3] - tp[0] * sx
    top_y = tp[4] + tp[1] * sy
    res = float(sx)
    # anisotropic pixel scale (sy != sx — common on satellite products):
    # carried as a res_y column; zonal/clip/sample honor it, integer-factor
    # resampling paths require squares and raise
    res_y = float(sy)
    # flip to engine convention: row 0 at MIN latitude
    arr = arr[::-1]
    y0_all = top_y - ny * res_y
    rows = []
    tid = 0
    for r0 in range(0, ny, tile_rows):
        for c0 in range(0, nx, tile_cols):
            sub = arr[r0:r0 + tile_rows, c0:c0 + tile_cols]
            rows.append((tid, float(top_x + c0 * res),
                         float(y0_all + r0 * res_y), res, res_y,
                         int(sub.shape[1]), int(sub.shape[0]),
                         sub.ravel().tolist()))
            tid += 1
    return spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double, "
              "res_y double, nx int, ny int, values array<double>")
