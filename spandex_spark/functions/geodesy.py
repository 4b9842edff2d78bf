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


def great_circle_points(lon1: Column, lat1: Column, lon2: Column,
                        lat2: Column, n_segments: int) -> Column:
    """Array of (lon, lat) structs tracing the great circle from p1 to
    p2 in ``n_segments`` equal arc steps (n_segments + 1 points,
    endpoints included) — geodesic densification, the geography
    ST_Segmentize shape (operators/simplify.py::segmentize is the
    PLANAR twin).  Spherical linear interpolation (slerp):
    p(f) = [sin((1-f)d)·p1 + sin(f·d)·p2] / sin(d) on unit vectors —
    pure codegen via transform() over sequence(), no Python, no
    shuffle.  Coincident/antipodal inputs (sin d == 0, path undefined
    for antipodes) return the two endpoints verbatim."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    p1, l1 = F.radians(lat1), F.radians(lon1)
    p2, l2 = F.radians(lat2), F.radians(lon2)
    x1 = F.cos(p1) * F.cos(l1)
    y1 = F.cos(p1) * F.sin(l1)
    z1 = F.sin(p1)
    x2 = F.cos(p2) * F.cos(l2)
    y2 = F.cos(p2) * F.sin(l2)
    z2 = F.sin(p2)
    dot = F.greatest(F.lit(-1.0),
                     F.least(F.lit(1.0), x1 * x2 + y1 * y2 + z1 * z2))
    d = F.acos(dot)
    sind = F.sin(d)

    def pt(f):
        a = F.sin((F.lit(1.0) - f) * d) / sind
        b = F.sin(f * d) / sind
        x = a * x1 + b * x2
        y = a * y1 + b * y2
        z = a * z1 + b * z2
        lon = F.degrees(F.atan2(y, x))
        lat = F.degrees(F.atan2(z, F.sqrt(x * x + y * y)))
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    frac = F.transform(
        F.sequence(F.lit(0), F.lit(n_segments)),
        lambda i: pt(i.cast("double") / F.lit(float(n_segments))))
    degenerate = F.array(F.struct(lon1.alias("lon"), lat1.alias("lat")),
                         F.struct(lon2.alias("lon"), lat2.alias("lat")))
    return F.when(sind == 0, degenerate).otherwise(frac)
