"""ST_Azimuth / ST_Project analogs as pure JVM Column expressions.

PostGIS geography semantics on the sphere (the engine's geodesic model
everywhere else — `geom.haversine_m`, `spherical_ring_area` — uses the
same EARTH_RADIUS_M): `azimuth` is the initial great-circle bearing
from north, in radians [0, 2π) like ST_Azimuth; `project` is the
great-circle destination point at a distance (meters) and bearing.
Both are whole-stage-codegen trig — no Python, usable in any join/
filter/select at 10^12 rows.

Identities (pytested, numpy-free): project(p, d, azimuth(p, q)) lands
on the great circle toward q; haversine_m(p, project(p, d, θ)) == d to
FP tolerance; azimuth east/north/west/south hit π/2, 0, 3π/2, π.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spandex_spark.geom import EARTH_RADIUS_M


def azimuth_expr(lon1: Column, lat1: Column,
                 lon2: Column, lat2: Column) -> Column:
    """Initial great-circle bearing point1 → point2, radians from north
    in [0, 2π) (ST_Azimuth geography semantics). NULL for coincident
    points, like PostGIS."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2) - F.radians(lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    two_pi = 2.0 * 3.141592653589793
    az = F.pmod(F.atan2(y, x) + F.lit(two_pi), F.lit(two_pi))
    return F.when((lon1 == lon2) & (lat1 == lat2), F.lit(None)).otherwise(az)


def project_expr(lon: Column, lat: Column, dist_m: Column,
                 azimuth: Column) -> Column:
    """Destination point struct (lon, lat) at great-circle distance
    ``dist_m`` meters along initial bearing ``azimuth`` (radians from
    north) — ST_Project. Longitude normalized to [-180, 180)."""
    delta = dist_m / F.lit(EARTH_RADIUS_M)
    p1 = F.radians(lat)
    l1 = F.radians(lon)
    sin_p2 = (F.sin(p1) * F.cos(delta)
              + F.cos(p1) * F.sin(delta) * F.cos(azimuth))
    p2 = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), sin_p2)))
    l2 = l1 + F.atan2(F.sin(azimuth) * F.sin(delta) * F.cos(p1),
                      F.cos(delta) - F.sin(p1) * sin_p2)
    lon_out = F.pmod(F.degrees(l2) + 180.0, F.lit(360.0)) - 180.0
    return F.struct(lon_out.alias("lon"), F.degrees(p2).alias("lat"))
