"""spandex_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Rebuilds the capability surface of UDST/spandex (PostGIS-backed spatial ETL:
point-in-polygon tagging, area-weighted overlay, kNN nearest-feature joins,
raster<->vector zonal extraction, target scaling, geometry validation,
reprojection — see SURVEY.md §2) as idiomatic Spark DataFrame programs:
a 64-bit quadkey cell index, two-phase cell joins (coarse cell equi-join,
exact numpy refine in vectorized Arrow UDFs), explicit skew salting, and
Iceberg-style Parquet+manifest tables with partition-granularity
checkpoint/resume and lineage metrics.

No code is ported from the reference; reference citations in docstrings are
symbol-level anchors (spandex/<file>.py::<symbol>) per SURVEY.md's citation
policy (the reference mount was empty at survey time).
"""

__version__ = "0.1.0"
