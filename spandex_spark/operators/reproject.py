"""O5 — reprojection / conform SRIDs.

Reference semantics: spandex/spatialtoolz.py::conform_srids / ::reproject
(ST_Transform to the project SRID). Supported analytically (no pyproj in
env): EPSG:4326 <-> EPSG:3857. All internal engine math stays in 4326;
reprojection is an output/ingest transform."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.functions.spatial import webmercator_udf


def reproject(df: DataFrame, *, lon_col: str = "lon", lat_col: str = "lat",
              to_srid: int = 3857, x_col: str = "x", y_col: str = "y") -> DataFrame:
    if to_srid != 3857:
        raise NotImplementedError(
            "analytic reprojection supports EPSG:3857 only (no pyproj in env)")
    merc = webmercator_udf(F.col(lon_col), F.col(lat_col))
    return df.withColumn(x_col, merc["x"]).withColumn(y_col, merc["y"])
