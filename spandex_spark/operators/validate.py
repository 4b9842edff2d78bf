"""O6 — geometry validation.

Reference semantics: spandex/spatialtoolz.py::invalid_geometry_check
(ST_IsValid) and ::duplicate_stacked_geometry_check (stacked identical
geometries). Validity runs in the vectorized numpy kernel; duplicates are a
hash-groupBy on a canonical geometry digest (JVM-side sha2 over the
serialized ring)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.functions.spatial import geom_is_valid_udf


def invalid_geometry_check(df: DataFrame, id_col: str) -> DataFrame:
    """Rows whose polygon fails validity (ring closure, >=3 distinct
    vertices, non-self-intersection)."""
    return (df.withColumn("is_valid", geom_is_valid_udf(F.col("geom")))
            .filter(~F.col("is_valid"))
            .select(id_col, "is_valid"))


def geom_digest(geom_col):
    """Canonical digest of a geometry (coordinate text, 12 dp, plus ring
    structure — two geometries with equal vertices but different holes
    must not collide)."""
    xs_txt = F.array_join(F.transform(geom_col["xs"], lambda v: F.format_number(v, 12)), ",")
    ys_txt = F.array_join(F.transform(geom_col["ys"], lambda v: F.format_number(v, 12)), ",")
    off_txt = F.array_join(F.transform(geom_col["ring_offsets"],
                                       lambda v: v.cast("string")), ",")
    return F.sha2(F.concat_ws("|", xs_txt, ys_txt, off_txt), 256)


def duplicate_stacked_geometry_check(df: DataFrame, id_col: str) -> DataFrame:
    """Groups of rows sharing an identical geometry (stacked features)."""
    with_digest = df.withColumn("_digest", geom_digest(F.col("geom")))
    dups = (with_digest.groupBy("_digest")
            .agg(F.count("*").alias("n_stacked"),
                 F.collect_list(id_col).alias("ids"))
            .filter(F.col("n_stacked") > 1))
    return dups.select("n_stacked", "ids")
