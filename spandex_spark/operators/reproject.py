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
