"""O1/E1 — point-in-polygon tagging via two-phase cell join.

Reference semantics: spandex/spatialtoolz.py::tag — label each target row
with the id of the source polygon containing it (PostGIS
``ST_Contains(src.geom, ST_Centroid(tgt.geom))``). Here the ST_Contains is
a coarse quadkey-cell equi-join (Catalyst broadcast or shuffle hash join,
AQE-managed) followed by an exact vectorized ray-cast refine — the
load-bearing pattern for every spatial operator in this engine.

Scale notes (100 TB): the points side streams (never collected, never
deduped); the polygon side explodes into covering cells and is broadcast
when small (zone layers almost always are — even 10M polygons x 4 cells is
a few GB, below a large cluster's broadcast budget with
autoBroadcastJoinThreshold raised) else shuffle-hash-joined on `cell` with
AQE skew splitting + explicit mega-cell salting (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.functions.spatial import cell_of_udf, cover_cells_udf, pip_refine, centroid_udf


def tag_points(points: DataFrame, polygons: DataFrame, *,
               poly_id_col: str, point_id_col: str, level: int = 9,
               lon_col: str = "lon", lat_col: str = "lat",
               poly_attr_cols: tuple[str, ...] = (),
               broadcast_polys: bool = True) -> DataFrame:
    """Tag each point with the containing polygon's id (NULL if none).

    Returns all point columns + ``poly_id_col`` (+ requested polygon attrs).
    For disjoint polygon layers each point matches at most one polygon; for
    overlapping layers the smallest ``poly_id_col`` wins (deterministic).
    """
    polys = polygons.select(
        F.col(poly_id_col).alias("_pid"), "geom",
        *[F.col(c).alias(f"_attr_{c}") for c in poly_attr_cols])
    polys_cells = polys.withColumn(
        "cell", F.explode(cover_cells_udf(F.col("geom"), level)))
    if broadcast_polys:
        polys_cells = F.broadcast(polys_cells)

    pts = points.withColumn(
        "cell", cell_of_udf(F.col(lon_col), F.col(lat_col), level))

    cand = pts.join(polys_cells, "cell", "inner")
    hits = cand.filter(
        pip_refine(F.col(lon_col), F.col(lat_col), F.col("geom"), F.col("_pid")))

    # winner per point: min poly id (unique anyway for disjoint layers).
    agg_cols = [F.min("_pid").alias(poly_id_col)] + [
        F.min_by(f"_attr_{c}", "_pid").alias(c) for c in poly_attr_cols]
    winners = hits.groupBy(point_id_col).agg(*agg_cols)

    return points.join(winners, point_id_col, "left")


def tag(targets: DataFrame, polygons: DataFrame, *,
        poly_id_col: str, target_id_col: str, level: int = 9,
        poly_attr_cols: tuple[str, ...] = ()) -> DataFrame:
    """Polygon-target variant of spandex/spatialtoolz.py::tag: tags each
    target polygon by the source polygon containing its centroid
    (ST_Centroid + ST_Contains)."""
    cent = targets.withColumn("_c", centroid_udf(F.col("geom")))
    cent = cent.withColumn("_clon", F.col("_c.x")).withColumn("_clat", F.col("_c.y")).drop("_c")
    out = tag_points(cent, polygons, poly_id_col=poly_id_col,
                     point_id_col=target_id_col, level=level,
                     lon_col="_clon", lat_col="_clat",
                     poly_attr_cols=poly_attr_cols)
    return out.drop("_clon", "_clat")
