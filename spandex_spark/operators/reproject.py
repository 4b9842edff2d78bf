"""O5 — reprojection / conform SRIDs.

Reference semantics: spandex/spatialtoolz.py::conform_srids / ::reproject
(ST_Transform to the project SRID). Supported analytically (no pyproj in
env): EPSG:4326 <-> EPSG:3857, the UTM family EPSG:32601-32660 (north)
/ 32701-32760 (south) via the transverse-Mercator series, the
Lambert-Conformal-Conic 2SP family (geom.LCC_ZONES: NAD83 California
state-plane zones 1-6 EPSG:26941-26946 — the CRSs spandex's UrbanSim
parcel users live in — plus Lambert-93 EPSG:2154 and StatCan EPSG:3347),
and the Albers equal-area family (geom.ALBERS_ZONES: EPSG:5070 CONUS,
EPSG:3310 California Albers, EPSG:3577 Australian Albers). All internal engine
math stays in 4326; reprojection is an output/ingest transform.

Both directions are supported: ``reproject`` goes 4326 → projected
(output), ``reproject_inverse`` goes projected → 4326 (ingest — the
reference's UrbanSim users LOAD state-plane parcels, i.e. the inverse is
the direction conform_srids actually runs at import time). Each family's
inverse is the published Snyder series next to its forward in geom.py;
round-trips are sub-mm in zone (property-tested)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark import geom as _geom
from spandex_spark.functions.spatial import (webmercator_udf, utm_udf,
                                             lcc_udf, albers_udf,
                                             webmercator_inv_udf,
                                             utm_inv_udf, lcc_inv_udf,
                                             albers_inv_udf)


def reproject(df: DataFrame, *, lon_col: str = "lon", lat_col: str = "lat",
              to_srid: int = 3857, x_col: str = "x", y_col: str = "y") -> DataFrame:
    if to_srid == 3857:
        out = webmercator_udf(F.col(lon_col), F.col(lat_col))
    elif 32601 <= to_srid <= 32660:
        out = utm_udf(F.col(lon_col), F.col(lat_col), to_srid - 32600, True)
    elif 32701 <= to_srid <= 32760:
        out = utm_udf(F.col(lon_col), F.col(lat_col), to_srid - 32700, False)
    elif to_srid in _geom.LCC_ZONES:
        out = lcc_udf(F.col(lon_col), F.col(lat_col), to_srid)
    elif to_srid in _geom.ALBERS_ZONES:
        out = albers_udf(F.col(lon_col), F.col(lat_col), to_srid)
    else:
        raise NotImplementedError(
            "analytic reprojection supports EPSG:3857, UTM "
            "(EPSG:32601-32660 / 32701-32760), the LCC zones in "
            "geom.LCC_ZONES, and the Albers zones in geom.ALBERS_ZONES; "
            "no pyproj in env")
    return df.withColumn(x_col, out["x"]).withColumn(y_col, out["y"])


def _vertex_transform(srid: int, inverse: bool):
    """Numpy (xs, ys) -> (X, Y) for the family owning ``srid``."""
    if srid == 3857:
        return (_geom.webmercator_to_lonlat if inverse
                else _geom.lonlat_to_webmercator)
    if 32601 <= srid <= 32660 or 32701 <= srid <= 32760:
        north = srid <= 32660
        zone = srid - (32600 if north else 32700)
        fwd = _geom.lonlat_to_utm
        inv = _geom.utm_to_lonlat
        if inverse:
            return lambda x, y: inv(x, y, zone, north)
        return lambda x, y: fwd(x, y, zone, north)
    for table, fwd, inv in ((_geom.LCC_ZONES, _geom.lonlat_to_lcc,
                             _geom.lcc_to_lonlat),
                            (_geom.ALBERS_ZONES, _geom.lonlat_to_albers,
                             _geom.albers_to_lonlat)):
        if srid in table:
            p1, p2, p0, l0, fe, fn = table[srid]
            f = inv if inverse else fwd
            return lambda x, y: f(x, y, phi1=p1, phi2=p2, phi0=p0,
                                  lam0=l0, fe=fe, fn=fn)
    raise NotImplementedError(
        "analytic reprojection supports EPSG:3857, UTM, geom.LCC_ZONES, "
        "geom.ALBERS_ZONES; no pyproj in env")


def reproject_geom(df: DataFrame, *, srid: int, inverse: bool = False,
                   geom_col: str = "geom",
                   out_col: str | None = None) -> DataFrame:
    """ST_Transform on GEOMETRY: every vertex of the struct-of-arrays
    geometry runs through the family's closed-form series (forward
    4326 → ``srid``, or ``inverse=True`` for projected → 4326 — the
    direction that LOADS state-plane parcel layers). The whole Arrow
    batch's vertices concatenate into ONE numpy kernel call (no per-ring
    Python), ring structure is untouched, bbox recomputed."""
    from pyspark.sql.functions import pandas_udf
    from spandex_spark.operators.trim import _GEOM_TYPE

    fn = _vertex_transform(srid, inverse)
    out_col = out_col or geom_col

    @pandas_udf(_GEOM_TYPE)
    def _tx(kind: pd.Series, xs: pd.Series, ys: pd.Series,
            offs: pd.Series) -> pd.DataFrame:
        lens = [0 if x is None else len(x) for x in xs]
        flat_x = np.concatenate(
            [np.asarray(x, np.float64) for x in xs if x is not None]
            or [np.empty(0)])
        flat_y = np.concatenate(
            [np.asarray(y, np.float64) for y in ys if y is not None]
            or [np.empty(0)])
        X, Y = fn(flat_x, flat_y)
        kinds, oxs, oys, ooffs, bbs = [], [], [], [], []
        pos = 0
        for i, n in enumerate(lens):
            if n == 0:
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            gx = X[pos:pos + n]
            gy = Y[pos:pos + n]
            pos += n
            kinds.append(int(kind.iloc[i]))
            oxs.append(gx.tolist()); oys.append(gy.tolist())
            o = offs.iloc[i]
            ooffs.append([int(v) for v in o] if o is not None else [0, n])
            bbs.append({"minx": float(gx.min()), "miny": float(gy.min()),
                        "maxx": float(gx.max()), "maxy": float(gy.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": ooffs, "bbox": bbs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _tx(g["kind"], g["xs"], g["ys"],
                                     g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(),
                        F.col(out_col)))


def reproject_inverse(df: DataFrame, *, from_srid: int,
                      x_col: str = "x", y_col: str = "y",
                      lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Projected → EPSG:4326 (the ST_Transform ingest direction): append
    ``lon_col``/``lat_col`` computed from projected ``x_col``/``y_col``.
    Same family dispatch as :func:`reproject`."""
    if from_srid == 3857:
        out = webmercator_inv_udf(F.col(x_col), F.col(y_col))
    elif 32601 <= from_srid <= 32660:
        out = utm_inv_udf(F.col(x_col), F.col(y_col), from_srid - 32600,
                          True)
    elif 32701 <= from_srid <= 32760:
        out = utm_inv_udf(F.col(x_col), F.col(y_col), from_srid - 32700,
                          False)
    elif from_srid in _geom.LCC_ZONES:
        out = lcc_inv_udf(F.col(x_col), F.col(y_col), from_srid)
    elif from_srid in _geom.ALBERS_ZONES:
        out = albers_inv_udf(F.col(x_col), F.col(y_col), from_srid)
    else:
        raise NotImplementedError(
            "analytic inverse reprojection supports the same families as "
            "reproject: EPSG:3857, UTM, geom.LCC_ZONES, geom.ALBERS_ZONES")
    return (df.withColumn(lon_col, out["lon"])
            .withColumn(lat_col, out["lat"]))


def transform(df: DataFrame, *, from_srid: int, to_srid: int,
              x_col: str = "x", y_col: str = "y",
              out_x: str = "tx", out_y: str = "ty") -> DataFrame:
    """Projected → projected ST_Transform — the reference's
    ``conform_srids`` shape (spandex/spatialtoolz.py::conform_srids
    conforms every layer to a common SRID at import time; mixed
    state-plane sources are the UrbanSim reality).  Pure composition:
    inverse(from_srid) through EPSG:4326 then forward(to_srid), both
    legs the already-tested analytic Snyder series — this function adds
    column plumbing only.

    4326 endpoints degrade to the single-leg operators: from 4326 the
    input columns are lon/lat in ``x_col``/``y_col``; to 4326 the
    output is lon/lat in ``out_x``/``out_y``.  Round-trip exactness is
    the two legs' pytested property (sub-mm), so chained error is
    bounded by their sum."""
    if from_srid == to_srid:
        return (df.withColumn(out_x, F.col(x_col).cast("double"))
                .withColumn(out_y, F.col(y_col).cast("double")))
    if from_srid == 4326:
        mid = (df.withColumn("_t_lon", F.col(x_col).cast("double"))
               .withColumn("_t_lat", F.col(y_col).cast("double")))
    else:
        mid = reproject_inverse(df, from_srid=from_srid, x_col=x_col,
                                y_col=y_col, lon_col="_t_lon",
                                lat_col="_t_lat")
    if to_srid == 4326:
        out = (mid.withColumn(out_x, F.col("_t_lon"))
               .withColumn(out_y, F.col("_t_lat")))
    else:
        out = reproject(mid, lon_col="_t_lon", lat_col="_t_lat",
                        to_srid=to_srid, x_col=out_x, y_col=out_y)
    return out.drop("_t_lon", "_t_lat")
