from spandex_spark.operators.tag import tag_points, tag  # noqa: F401
from spandex_spark.operators.overlay import proportion_overlap  # noqa: F401
from spandex_spark.operators.knn import knn_join  # noqa: F401
from spandex_spark.operators.zonal import zonal_stats  # noqa: F401
from spandex_spark.operators.scaling import scale_to_targets  # noqa: F401
from spandex_spark.operators.validate import invalid_geometry_check, duplicate_stacked_geometry_check  # noqa: F401
from spandex_spark.operators.reproject import reproject  # noqa: F401
