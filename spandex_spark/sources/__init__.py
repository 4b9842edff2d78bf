from spandex_spark.sources.grids import (  # noqa: F401
    derived_points, zones_df, parcels_df, gazetteer_grid_df, raster_tiles_df,
)
from spandex_spark.sources.gpx import parse_gpx  # noqa: F401
from spandex_spark.sources.kml import parse_kml  # noqa: F401
