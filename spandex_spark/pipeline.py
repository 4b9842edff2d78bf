"""The flagship two-phase pipeline (north_star, BASELINE.json:6):
pages → geotag → cell-indexed PIP tag (+ optional kNN) — the end-to-end
job the driver smoke-checks and the bench harness times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spandex_spark.geotag import geotag
from spandex_spark.operators.tag import tag_points
from spandex_spark.operators.knn import knn_join


def flagship_tag(spark: SparkSession, pages: DataFrame, gazetteer: DataFrame,
                 zones: DataFrame, *, level: int = 9) -> DataFrame:
    """Geotag pages and tag each geotagged page with its containing zone.
    Preserves url/text byte-identity; pages without a geo signal keep NULL
    lon/lat/zone."""
    pts = geotag(pages, gazetteer)
    geo = pts.filter(F.col("lon").isNotNull())
    tagged = tag_points(geo, zones, poly_id_col="zone_id",
                        point_id_col="url", level=level,
                        poly_attr_cols=("zclass",))
    return tagged


def flagship_tag_knn(spark: SparkSession, pages: DataFrame,
                     gazetteer: DataFrame, zones: DataFrame, poi: DataFrame,
                     *, k: int = 3, level: int = 9) -> DataFrame:
    """Tag + nearest-POI join — the full PIP + kNN headline job."""
    tagged = flagship_tag(spark, pages, gazetteer, zones, level=level)
    geo = tagged.filter(F.col("lon").isNotNull())
    nn = knn_join(geo, poi, k=k, query_id_col="url", feature_id_col="poi_id")
    return (geo.join(nn.filter(F.col("rank") == 1)
                     .select("url", F.col("poi_id").alias("nearest_poi"),
                             F.col("dist_m").alias("nearest_poi_dist_m")),
                     "url", "left"))
