"""ST_GeneratePoints analog: uniform random points inside polygons —
dot-density maps, Monte-Carlo area work, synthetic point loads.

Reference semantics: PostGIS ST_GeneratePoints(geom, n, seed) does
rejection sampling in the bbox against the polygon. Same here, with
one distributed-correctness upgrade: PostGIS's seed gives
reproducibility per CALL; at 10^12 rows the result must also be
independent of PARTITIONING, so each row's RNG is seeded by
``sha256(id, seed)`` — the output for a given (row id, seed) is
identical no matter which executor draws it, how the input was split,
or what ran before (pytested under repartition).

Shape: one Arrow `mapInPandas` pass, no shuffle — points are BORN
exploded (id, pt_idx, lon, lat). Rejection batches are vectorized
numpy (`geom.points_in_rings` even-odd, so holes are excluded);
acceptance ~ area(polygon)/area(bbox), with a hard iteration cap for
degenerate slivers (rows that can't fill emit what they have —
documented, matching the GEOS behaviour of giving up, not hanging).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from spandex_spark import geom as _geom

_OUT = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("pt_idx", T.IntegerType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
])


def generate_points(df: DataFrame, *, n: int, id_col: str,
                    geom_col: str = "geom", seed: int = 0,
                    max_batches: int = 64) -> DataFrame:
    """``n`` uniform points per polygon row. Returns
    (id, pt_idx, lon, lat); NULL geometries emit nothing."""
    if n <= 0:
        raise ValueError("n must be positive")
    src = df.select(df[id_col].alias("id"),
                    df[geom_col]["xs"].alias("xs"),
                    df[geom_col]["ys"].alias("ys"),
                    df[geom_col]["ring_offsets"].alias("offs"))
    # ring rows are byte-tiny but each costs n rejection draws; pin the
    # parallelism so AQE/file-based partitioning can't serialise the
    # sampling (the rasterize burn lesson, BENCH/BASELINE.md)
    sc = df.sparkSession.sparkContext
    src = src.repartition(sc.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.xs is None:
                    continue
                xs = np.asarray(r.xs, np.float64)
                ys = np.asarray(r.ys, np.float64)
                offs = (np.asarray(r.offs, np.int64)
                        if r.offs is not None and len(r.offs) > 2 else None)
                x0, x1 = xs.min(), xs.max()
                y0, y1 = ys.min(), ys.max()
                digest = hashlib.sha256(
                    f"{int(r.id)}:{seed}".encode()).digest()
                rng = np.random.default_rng(
                    np.frombuffer(digest[:16], np.uint64))
                px = np.empty(0)
                py = np.empty(0)
                for _ in range(max_batches):
                    need = n - px.shape[0]
                    if need <= 0:
                        break
                    cx = rng.uniform(x0, x1, 2 * need + 16)
                    cy = rng.uniform(y0, y1, 2 * need + 16)
                    keep = _geom.points_in_rings(cx, cy, xs, ys, offs)
                    px = np.concatenate([px, cx[keep]])
                    py = np.concatenate([py, cy[keep]])
                for j in range(min(n, px.shape[0])):
                    out.append((int(r.id), j, float(px[j]), float(py[j])))
            yield pd.DataFrame(out, columns=["id", "pt_idx", "lon", "lat"])

    return src.mapInPandas(gen, _OUT)
