"""O2 — proportional / area-weighted overlay.

Reference semantics: spandex/spatialtoolz.py::proportion_overlap — for each
target polygon, SUM(ST_Area(ST_Intersection(t.geom, o.geom))) /
ST_Area(t.geom). Rebuilt as: cell join for candidate pairs → pair dedup
(a pair can meet in several cells) → exact intersection-area kernel in an
Arrow-batched pandas UDF (rectangle fast path is pure bbox arithmetic) →
hash aggregation per target.

Scale notes: pair dedup is one extra shuffle on (target_id, overlay_id);
at 100 TB this can be replaced by reference-point dedup (keep a pair only
in the cell of its intersection-bbox min corner) to stay shuffle-free —
recorded as the scale path; correctness-first version ships the dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark import geom as _geom
from spandex_spark.functions.spatial import cover_cells_udf


@pandas_udf(T.DoubleType())
def _ix_area(xs1: pd.Series, ys1: pd.Series, xs2: pd.Series, ys2: pd.Series) -> pd.Series:
    out = np.empty(len(xs1))
    for i in range(len(xs1)):
        out[i] = _geom.polygon_intersection_area(
            np.asarray(xs1.iloc[i], np.float64), np.asarray(ys1.iloc[i], np.float64),
            np.asarray(xs2.iloc[i], np.float64), np.asarray(ys2.iloc[i], np.float64))
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def _poly_area(xs: pd.Series, ys: pd.Series) -> pd.Series:
    out = np.empty(len(xs))
    for i in range(len(xs)):
        out[i] = abs(_geom.shoelace_area(np.asarray(xs.iloc[i], np.float64),
                                         np.asarray(ys.iloc[i], np.float64)))
    return pd.Series(out)


def polygon_area_udf(geom_col):
    """ST_Area analog."""
    return _poly_area(geom_col["xs"], geom_col["ys"])


def intersection_area_udf(geom_a, geom_b):
    """ST_Area(ST_Intersection(a, b)) analog."""
    return _ix_area(geom_a["xs"], geom_a["ys"], geom_b["xs"], geom_b["ys"])


def proportion_overlap(targets: DataFrame, overlays: DataFrame, *,
                       target_id_col: str, overlay_id_col: str,
                       level: int = 8, broadcast_overlays: bool = True,
                       keep_pairs: bool = False) -> DataFrame:
    """Fraction of each target polygon's area covered by the overlay layer.

    Returns (target_id_col, overlap_area, target_area, proportion_overlap);
    with ``keep_pairs`` returns per-(target, overlay) intersection rows
    instead (the trim/clip building block, O4).
    """
    tgt = targets.select(F.col(target_id_col).alias("_tid"),
                         F.col("geom").alias("_tgeom"))
    ovl = overlays.select(F.col(overlay_id_col).alias("_oid"),
                          F.col("geom").alias("_ogeom"))

    tgt_cells = tgt.withColumn("cell", F.explode(cover_cells_udf(F.col("_tgeom"), level)))
    ovl_cells = ovl.withColumn("cell", F.explode(cover_cells_udf(F.col("_ogeom"), level)))
    if broadcast_overlays:
        ovl_cells = F.broadcast(ovl_cells)

    pairs = (tgt_cells.join(ovl_cells, "cell", "inner")
             .dropDuplicates(["_tid", "_oid"]))

    pairs = pairs.withColumn(
        "ix_area", intersection_area_udf(F.col("_tgeom"), F.col("_ogeom")))
    pairs = pairs.filter(F.col("ix_area") > 0.0)

    if keep_pairs:
        return pairs.select(F.col("_tid").alias(target_id_col),
                            F.col("_oid").alias(overlay_id_col), "ix_area")

    tgt_area = tgt.withColumn("target_area", polygon_area_udf(F.col("_tgeom"))) \
                  .select("_tid", "target_area")
    agg = pairs.groupBy("_tid").agg(F.sum("ix_area").alias("overlap_area"))
    out = (tgt_area.join(agg, "_tid", "left")
           .withColumn("overlap_area", F.coalesce(F.col("overlap_area"), F.lit(0.0)))
           .withColumn("proportion_overlap",
                       F.col("overlap_area") / F.col("target_area")))
    return out.select(F.col("_tid").alias(target_id_col),
                      "overlap_area", "target_area", "proportion_overlap")
