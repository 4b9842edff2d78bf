"""Geohash encode/decode as PURE whole-stage-codegen expressions —
the ST_GeoHash / ST_PointFromGeoHash analogs.

The engine's native spatial key is the row-major quadkey
(`cells.py`; documented S2-style choice), but geohash is the
interchange key the outside world speaks (Elasticsearch, Redis,
public datasets), so the reference's users expect to emit and
consume it (PostGIS exposes ST_GeoHash; SURVEY.md §2 E2 is the
cell-index family).

No UDF anywhere: ``precision`` is a plan-time constant, so the
base32 bit interleave is UNROLLED into a fixed expression tree —
5·precision bit extracts (shiftright/AND), precision
`element_at` lookups into a literal char array, one `concat`.
Decode is the mirror tree over `array_position`. Both stay inside
whole-stage codegen (asserted by tests/test_geohash.py's plan
check), which at 100 TB means geohashing is a free rider on
whatever scan feeds it — no Python, no shuffle, no batch boundary.

Encoding contract (the standard one): even bit indices (0-based,
starting at the first bit) slice longitude, odd slice latitude;
decode returns the CELL CENTER.  ``lon=180`` / ``lat=90`` clamp
into the last cell, NULL coordinates yield NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 12:
        # 12 chars = 60 bits; beyond that the bit math leaves long range
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon bits, lat bits


def geohash_expr(lon: Column, lat: Column, precision: int = 9) -> Column:
    """Geohash string of (lon, lat) at ``precision`` chars."""
    lonbits, latbits = _bits(precision)
    # clamp BOTH ends: an out-of-range coordinate lands in the first or
    # last cell (shiftright on a negative index would emit garbage)
    ix = F.greatest(F.lit(0).cast("long"),
                    F.least(F.lit((1 << lonbits) - 1),
                            F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                                    * F.lit(float(1 << lonbits)))
                            .cast("long")))
    iy = F.greatest(F.lit(0).cast("long"),
                    F.least(F.lit((1 << latbits) - 1),
                            F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                                    * F.lit(float(1 << latbits)))
                            .cast("long")))
    alpha = F.array(*[F.lit(ch) for ch in _ALPHABET])
    chars = []
    for c in range(precision):
        idx = F.lit(0).cast("long")
        for j in range(5):
            i = 5 * c + j
            if i % 2 == 0:
                b = F.shiftright(ix, lonbits - 1 - i // 2)
            else:
                b = F.shiftright(iy, latbits - 1 - i // 2)
            idx = idx + b.bitwiseAND(F.lit(1)) * F.lit(1 << (4 - j))
        chars.append(F.element_at(alpha, (idx + 1).cast("int")))
    # least()/greatest() SKIP nulls, so the clamp would otherwise turn a
    # NULL coordinate into the last cell — guard explicitly
    return F.when(lon.isNotNull() & lat.isNotNull(), F.concat(*chars))


def geohash_decode_expr(gh: Column, precision: int) -> Column:
    """struct(lon, lat) = center of the geohash cell. ``precision``
    must match the string length (a plan-time constant; extra chars
    are ignored, shorter strings decode to NULL via array_position's
    0 on the empty char)."""
    lonbits, latbits = _bits(precision)
    alpha = F.array(*[F.lit(ch) for ch in _ALPHABET])
    idxs = [F.array_position(alpha, F.substring(gh, c + 1, 1)) - F.lit(1)
            for c in range(precision)]
    ix = F.lit(0).cast("long")
    iy = F.lit(0).cast("long")
    for c in range(precision):
        for j in range(5):
            i = 5 * c + j
            b = F.shiftright(idxs[c], 4 - j).bitwiseAND(F.lit(1))
            if i % 2 == 0:
                ix = ix + b * F.lit(1 << (lonbits - 1 - i // 2))
            else:
                iy = iy + b * F.lit(1 << (latbits - 1 - i // 2))
    # array_position yields 0 for a char outside the alphabet -> idx -1
    # -> poison the result to NULL
    bad = None
    for c in range(precision):
        isbad = idxs[c] < 0
        bad = isbad if bad is None else (bad | isbad)
    lon = (ix.cast("double") + F.lit(0.5)) / F.lit(float(1 << lonbits)) \
        * F.lit(360.0) - F.lit(180.0)
    lat = (iy.cast("double") + F.lit(0.5)) / F.lit(float(1 << latbits)) \
        * F.lit(180.0) - F.lit(90.0)
    return F.when(~bad, F.struct(lon.alias("lon"), lat.alias("lat")))
