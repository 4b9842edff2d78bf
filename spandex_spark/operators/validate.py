"""O6 — geometry validation.

Reference semantics: spandex/spatialtoolz.py::invalid_geometry_check
(ST_IsValid) and ::duplicate_stacked_geometry_check (stacked identical
geometries). Validity runs in the vectorized numpy kernel; duplicates are a
hash-groupBy on a canonical geometry digest (JVM-side sha2 over the
serialized ring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


def make_valid(df: DataFrame, *, geom_col: str = "geom",
               out_col: str = "geom_valid") -> DataFrame:
    """ST_MakeValid analog (PostGIS's invalid-parcel repair step — the
    companion to invalid_geometry_check's detection): each geometry's
    even-odd region is re-extracted as properly oriented simple rings via
    geom.make_valid_rings (the planar-arrangement kernel) — bowties split
    into lobes, duplicate/collinear vertices drop, holes come out CW.
    Zero-area degenerate input yields NULL ``out_col``. Per-row Arrow
    map, no shuffle."""
    from spandex_spark import geom as _geom
    from spandex_spark.operators.trim import _GEOM_TYPE

    @pandas_udf(_GEOM_TYPE)
    def _mv(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.DataFrame:
        kinds, oxs, oys, ooffs, bbs = [], [], [], [], []
        for x_arr, y_arr, o_arr in zip(xs, ys, offs):
            o = (np.asarray(o_arr, np.int64)
                 if o_arr is not None and len(o_arr) > 2 else None)
            try:
                rings = _geom.make_valid_rings(
                    np.asarray(x_arr, np.float64),
                    np.asarray(y_arr, np.float64), o)
            except Exception:
                rings = []  # thoroughly degenerate input -> NULL
            if not rings:
                kinds.append(None); oxs.append(None); oys.append(None)
                ooffs.append(None); bbs.append(None)
                continue
            ax = np.concatenate([r[0] for r in rings])
            ay = np.concatenate([r[1] for r in rings])
            ro = np.cumsum([0] + [r[0].shape[0] for r in rings])
            kinds.append(3 if len(rings) == 1 else 6)
            oxs.append(ax.tolist()); oys.append(ay.tolist())
            ooffs.append([int(v) for v in ro])
            bbs.append({"minx": float(ax.min()), "miny": float(ay.min()),
                        "maxx": float(ax.max()), "maxy": float(ay.max())})
        return pd.DataFrame({"kind": pd.array(kinds, dtype="Int8"),
                             "xs": oxs, "ys": oys,
                             "ring_offsets": ooffs, "bbox": bbs})

    g = F.col(geom_col)
    out = df.withColumn(out_col, _mv(g["xs"], g["ys"], g["ring_offsets"]))
    return out.withColumn(
        out_col, F.when(F.col(f"{out_col}.kind").isNotNull(), F.col(out_col)))
