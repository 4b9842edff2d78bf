"""Web-Mercator tile pyramid — slippy z/x/y tiling + rollup.

Reference semantics: the web-map tile grid (OSM/Bing/Google slippy
scheme) every geotagged-web-corpus heat map renders from; spandex's
north star names "a spatial-join + TILING engine" over web pages
(BASELINE.json:6) and this is the canonical web tiling.  `tile_xy`
follows the OSM Slippy-Map formulas; `tile_quadkey` is the Bing Maps
quadkey (Schwartz, MSDN "Bing Maps Tile System") — one string key per
tile whose PREFIXES are its ancestors, which is why it doubles as the
engine's hierarchical cell id (cells.py chose the same family).

Spark realization — pure JVM codegen, ONE shuffle for the whole pyramid:

* tile math is floor/ln/tan Column arithmetic (no Python, and every
  operand is ANSI-SQL-replicable for oracle parity — asinh is avoided
  on purpose: DuckDB lacks it);
* `tile_pyramid` computes the MAX-zoom tile once per row, then explodes
  z = min..max with x >> (zmax-z) bit shifts (a parent tile is a right
  shift — no re-derivation from lon/lat per level) and runs ONE
  groupBy(z, x, y).  Catalyst's partial aggregation collapses the
  (zmax-zmin+1)x map fan-out to ~distinct-tiles rows per task BEFORE
  the exchange, so the shuffle carries the pyramid, not the corpus.
  The alternative (per-level iterative rollup from the previous level)
  is log-depth with geometrically shrinking shuffles but re-reads its
  own output z-zmin times; at 10-12 levels the single-pass explode wins
  on wall clock and lineage simplicity.

Scale shape: output rows = sum_z (occupied tiles at z) <= (4/3) x
occupied tiles at zmax; a viral mega-tile is map-side-combined per
task, so skew lands on the reducer only at sum granularity.

Latitude is clamped to the Web-Mercator singularity bound +/-85.05113
(floor'd at 1e-5 precision below the exact atan(sinh(pi)) so the y
formula stays strictly inside [0, n)), the slippy convention — poles
belong to the top/bottom tile row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["MAX_MERCATOR_LAT", "tile_xy", "tile_quadkey", "tile_bounds",
           "tile_pyramid", "render_mvt_tiles"]

# atan(sinh(pi)) = 85.05112877980659...; floor at 1e-5 keeps the clamp
# strictly inside the open interval so floor() below never hits n
MAX_MERCATOR_LAT = 85.05112


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy tile (x, y) LongType columns at `zoom` (z fixed per call —
    tile schemes are per-level artifacts, not per-row).  Longitude wraps
    into [-180, 180); latitude clamps to the Mercator bound."""
    if not 0 <= zoom <= 30:
        raise ValueError(f"zoom {zoom} outside [0, 30]")
    n = F.lit(float(1 << zoom))
    lonw = F.pmod(lon + F.lit(180.0), F.lit(360.0))
    x = F.floor(lonw / F.lit(360.0) * n)
    latc = F.greatest(F.lit(-MAX_MERCATOR_LAT),
                      F.least(F.lit(MAX_MERCATOR_LAT), lat))
    phi = F.radians(latc)
    # ln(tan phi + sec phi) without asinh (see module docstring)
    merc = F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * n)
    clamp = F.lit((1 << zoom) - 1).cast("long")
    return (F.least(clamp, F.greatest(F.lit(0).cast("long"),
                                      x.cast("long"))),
            F.least(clamp, F.greatest(F.lit(0).cast("long"),
                                      y.cast("long"))))


def tile_quadkey(x: Column, y: Column, zoom: int) -> Column:
    """Bing quadkey string of tile (x, y, zoom): digit i (outermost
    first) = x-bit + 2*y-bit at level i.  Unrolled concat of `zoom`
    codegen digits (the functions/geohash.py interleave pattern);
    zoom 0 is the empty string (the single world tile)."""
    digits = []
    for i in range(zoom, 0, -1):
        d = (F.shiftright(x, i - 1).bitwiseAND(F.lit(1))
             + F.lit(2) * F.shiftright(y, i - 1).bitwiseAND(F.lit(1)))
        digits.append(d.cast("string"))
    return F.concat(*digits) if digits else F.lit("")


def tile_bounds(x: Column, y: Column, zoom: int) -> tuple[Column, Column,
                                                          Column, Column]:
    """(west, south, east, north) degree bounds of a slippy tile — the
    inverse of tile_xy, for rendering/joining tile aggregates back onto
    geometry.  Pure codegen (exp-free: the inverse Gudermannian is
    2*atan(exp(u)) - pi/2; Spark and DuckDB both have atan/exp)."""
    n = F.lit(float(1 << zoom))
    west = x.cast("double") / n * F.lit(360.0) - F.lit(180.0)
    east = (x.cast("double") + F.lit(1.0)) / n * F.lit(360.0) - F.lit(180.0)

    def lat_of(yc: Column) -> Column:
        u = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * yc / n)
        return F.degrees(F.lit(2.0) * F.atan(F.exp(u)) - F.lit(math.pi / 2))

    north = lat_of(y.cast("double"))
    south = lat_of(y.cast("double") + F.lit(1.0))
    return west, south, east, north


def tile_pyramid(points: DataFrame, *, min_zoom: int, max_zoom: int,
                 lon_col: str = "lon", lat_col: str = "lat",
                 weight_col: str | None = None,
                 quadkey: bool = False) -> DataFrame:
    """Aggregate points into every tile of zooms [min_zoom, max_zoom]:
    (z, x, y, n [, wsum] [, quadkey]).  n counts points; wsum sums
    `weight_col` when given (NULL weights count toward n but add 0 —
    the SUM-ignores-NULL SQL convention).  Rows with NULL coordinates
    are dropped (no tile owns them).  One shuffle; see module docstring
    for why the pyramid explodes from zmax instead of rolling up
    level-by-level."""
    if not 0 <= min_zoom <= max_zoom:
        raise ValueError(f"need 0 <= min_zoom <= max_zoom, got "
                         f"{min_zoom}..{max_zoom}")
    lon, lat = F.col(lon_col), F.col(lat_col)
    bx, by = tile_xy(lon, lat, max_zoom)
    base = (points.filter(lon.isNotNull() & lat.isNotNull())
            .select(bx.alias("_bx"), by.alias("_by"),
                    *([F.col(weight_col).cast("double").alias("_w")]
                      if weight_col else [])))
    lv = base.withColumn("z", F.explode(
        F.sequence(F.lit(min_zoom), F.lit(max_zoom))))
    # SQL shiftright takes a column-valued shift (the PySpark wrapper
    # doesn't), hence expr
    lv = lv.select(
        F.col("z").cast("int").alias("z"),
        F.expr(f"shiftright(_bx, {max_zoom} - z)").alias("x"),
        F.expr(f"shiftright(_by, {max_zoom} - z)").alias("y"),
        *([F.col("_w")] if weight_col else []))
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight_col:
        aggs.append(F.sum("_w").alias("wsum"))
    out = lv.groupBy("z", "x", "y").agg(*aggs)
    if quadkey:
        # per-z quadkey needs the unrolled max_zoom form truncated to z:
        # digits above z are leading ancestors of the zmax key, but here
        # x/y are ALREADY at level z, so substring-of-full-key is wrong;
        # build the key per level via the variable-length digit loop
        qk = F.lit("")
        for i in range(max_zoom, 0, -1):
            d = F.when(
                F.col("z") >= i,
                (F.expr(f"shiftright(x, {i} - 1) & 1")
                 + F.lit(2) * F.expr(f"shiftright(y, {i} - 1) & 1"))
                .cast("string")).otherwise(F.lit(""))
            qk = F.concat(qk, d)
        out = out.withColumn("quadkey", qk)
    return out


def render_mvt_tiles(points: DataFrame, *, zoom: int,
                     lon_col: str = "lon", lat_col: str = "lat",
                     id_col: str | None = None,
                     prop_cols: tuple[str, ...] = (),
                     layer_name: str = "points",
                     extent: int = 4096) -> DataFrame:
    """Render a point corpus into Mapbox Vector Tiles at one zoom:
    (z, x, y, mvt binary, n_features) — the blobs a slippy-map client
    fetches as z/x/y.mvt.  The north star's tiling engine serves web-map
    clients; MVT is that wire format (sources/mvt.py implements the open
    spec from scratch, writer+reader).

    Spark shape, tuned for 10^12 rows:
    * tile id AND tile-local pixel coordinates are computed JVM-side
      with the exact tile_xy formulas (global pixel index at
      zoom*extent resolution, then split into tile and offset by
      integer div/mod — one derivation, no float drift between the
      two), so the Python stage receives pre-quantized ints;
    * ONE shuffle, on the tile key, via applyInPandas — each tile's
      features arrive as one Arrow batch and the UDF only PACKS bytes
      (sources/mvt.py encode_layer), no geometry math in Python;
    * blob size is bounded by extent quantization (dedup of coincident
      pixels is the renderer's choice upstream), never by corpus size.

    Property columns are carried as MVT layer-interned tags; NULL
    props are omitted per feature (MVT has no null Value).  Rows with
    NULL coordinates are dropped (no tile owns them).
    """
    import pandas as pd

    from spandex_spark.sources import mvt as _mvt

    if not 0 <= zoom <= 30:
        raise ValueError(f"zoom {zoom} outside [0, 30]")
    lon, lat = F.col(lon_col), F.col(lat_col)
    n = F.lit(float(1 << zoom))
    ext = F.lit(float(extent))
    lonw = F.pmod(lon + F.lit(180.0), F.lit(360.0))
    gx = F.floor(lonw / F.lit(360.0) * n * ext).cast("long")
    latc = F.greatest(F.lit(-MAX_MERCATOR_LAT),
                      F.least(F.lit(MAX_MERCATOR_LAT), lat))
    phi = F.radians(latc)
    merc = F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi))
    gy = (F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0)
                  * n * ext)).cast("long")
    gmax = F.lit((1 << zoom) * extent - 1).cast("long")
    gx = F.least(gmax, F.greatest(F.lit(0).cast("long"), gx))
    gy = F.least(gmax, F.greatest(F.lit(0).cast("long"), gy))
    sel = [(gx / extent).cast("long").alias("x"),
           (gy / extent).cast("long").alias("y"),
           (gx % extent).cast("int").alias("px"),
           (gy % extent).cast("int").alias("py")]
    if id_col:
        sel.append(F.col(id_col).cast("long").alias("_fid"))
    for c in prop_cols:
        sel.append(F.col(c).alias(c))
    base = points.filter(lon.isNotNull() & lat.isNotNull()).select(*sel)

    out_schema = ("z int, x long, y long, mvt binary, n_features long")
    props = tuple(prop_cols)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        feats = []
        fids = pdf["_fid"].tolist() if id_col else [None] * len(pdf)
        prop_series = {c: pdf[c].tolist() for c in props}
        for i in range(len(pdf)):
            p = {}
            for c in props:
                v = prop_series[c][i]
                if v is None or (isinstance(v, float) and v != v):
                    continue
                # numpy scalars -> plain python for the byte packer
                p[c] = v.item() if hasattr(v, "item") else v
            feats.append({
                "id": None if fids[i] is None else int(fids[i]),
                "type": _mvt.POINT,
                "parts": [[(int(pdf["px"].iat[i]), int(pdf["py"].iat[i]))]],
                "props": p})
        blob = _mvt.encode_tile([(layer_name, feats)], extent=extent)
        return pd.DataFrame({"z": [zoom], "x": [int(key[0])],
                             "y": [int(key[1])], "mvt": [blob],
                             "n_features": [len(feats)]})

    return base.groupBy("x", "y").applyInPandas(build, out_schema)
