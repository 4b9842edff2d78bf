"""HMM map matching — snap noisy point tracks onto a road network.

Reference semantics: Newson & Krumm 2009 ("Hidden Markov map matching
through noise and sparseness", GIS '09) — THE map-matching algorithm
(OSRM `match`, Valhalla Meili implement it): road candidates are HMM
states, a Gaussian of the snap distance is the emission, and the
transition prefers candidate pairs whose on-road travel resembles the
great-circle step, so the decoded path stays on one road through
noise instead of ping-ponging to whichever road each point happens to
fall nearest (the per-point-nearest failure mode, pytested head-on).

Simplification, documented: the transition's route distance is the
straight-line distance between consecutive snap points, not a network
shortest path — exact N-K routes through the graph; the straight-line
proxy keeps the operator self-contained and is the standard first
approximation (fine at GPS densities where consecutive points are a
few road segments apart).

Spark realization: the road layer is BROADCAST-SIZED BY CONTRACT
(the nearest_line_join kernel contract — a continent's road
centerlines in SoA form fit executor memory; shard the corpus, not
the map) and rides the closure; tracks shuffle ONCE
(groupBy(group).applyInPandas) and each runs vectorized
candidate-projection + Viterbi locally.  Everything is deterministic:
fixed candidate order, argmax ties break to the smallest road id.

Coordinates are lon/lat degrees; snap distances convert to meters via
the local equirectangular scale (cos of the track's mean latitude) —
exact enough at emission-sigma scales (10-100 m).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark.geom import EARTH_RADIUS_M

__all__ = ["map_match"]

_DEG_M = EARTH_RADIUS_M * math.pi / 180.0


def _segments_of(rows):
    """Flatten a road layer into parallel segment arrays."""
    ax, ay, bx, by, rid = [], [], [], [], []
    for r in rows:
        g = r["_g"]
        xs = np.asarray(g["xs"], np.float64)
        ys = np.asarray(g["ys"], np.float64)
        offs = g["ring_offsets"]
        parts = (list(zip(offs[:-1], offs[1:]))
                 if offs is not None and len(offs) > 2
                 else [(0, xs.shape[0])])
        for s, e in parts:
            if e - s < 2:
                continue
            ax.append(xs[s:e - 1]); ay.append(ys[s:e - 1])
            bx.append(xs[s + 1:e]); by.append(ys[s + 1:e])
            rid.append(np.full(e - s - 1, int(r["_lid"]), np.int64))
    if not ax:
        raise ValueError("map_match: road layer has no segments")
    return (np.concatenate(ax), np.concatenate(ay),
            np.concatenate(bx), np.concatenate(by),
            np.concatenate(rid))


def map_match(points: DataFrame, roads: DataFrame, *, group_col: str,
              road_id_col: str, ts_col: str = "ts",
              lon_col: str = "lon", lat_col: str = "lat",
              geom_col: str = "geom", k: int = 5,
              sigma_m: float = 25.0, beta_m: float = 50.0) -> DataFrame:
    """Viterbi-decode each track onto the road layer.  Output: one row
    per input point — (group_col, ts_col, lon, lat, road_id, snap_lon,
    snap_lat, dist_m).  ``k`` candidates per point; ``sigma_m`` = GPS
    noise (emission), ``beta_m`` = transition tolerance.  Points
    farther than 6*sigma_m from every road carry road_id NULL and
    break the chain (the N-K gap handling)."""
    rows = roads.select(F.col(road_id_col).alias("_lid"),
                        F.col(geom_col).alias("_g")).collect()  # collect-ok: road layer broadcast-sized by contract (nearest_line_join kernel precedent)
    ax, ay, bx, by, rid = _segments_of(rows)

    gf = points.schema[group_col]
    tf = points.schema[ts_col]
    schema = T.StructType([
        T.StructField(group_col, gf.dataType),
        T.StructField(ts_col, tf.dataType),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("road_id", T.LongType()),
        T.StructField("snap_lon", T.DoubleType()),
        T.StructField("snap_lat", T.DoubleType()),
        T.StructField("dist_m", T.DoubleType()),
    ])
    max_d = 6.0 * sigma_m

    def decode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, lon_col, lat_col],
                              kind="mergesort")
        lon = pdf[lon_col].to_numpy(float)
        lat = pdf[lat_col].to_numpy(float)
        cy = math.cos(math.radians(float(np.nanmean(lat))))
        mx, my = _DEG_M * cy, _DEG_M          # deg -> m scale
        n = lon.shape[0]
        # candidates per point: project onto every segment, take the
        # best segment per ROAD, then the k nearest roads
        cands = []                             # (rids, sx, sy, dm) per pt
        ex, ey = (bx - ax) * mx, (by - ay) * my
        seg2 = ex * ex + ey * ey
        seg2[seg2 == 0] = 1e-300
        for i in range(n):
            px_, py_ = (lon[i] - ax) * mx, (lat[i] - ay) * my
            t = np.clip((px_ * ex + py_ * ey) / seg2, 0.0, 1.0)
            dx, dy = px_ - t * ex, py_ - t * ey
            d = np.hypot(dx, dy)
            order = np.lexsort((rid, d))       # stable by (d, rid)
            seen, pick = set(), []
            for j in order:
                if d[j] > max_d:
                    break
                if rid[j] in seen:
                    continue
                seen.add(rid[j]); pick.append(j)
                if len(pick) == k:
                    break
            pick = np.array(pick, np.int64)
            if pick.size:
                cands.append((rid[pick],
                              ax[pick] + t[pick] * (bx - ax)[pick],
                              ay[pick] + t[pick] * (by - ay)[pick],
                              d[pick]))
            else:
                cands.append(None)
        # Viterbi over log probs; None candidates break the chain
        out_road = np.full(n, -1, np.int64)
        out_sx = np.full(n, np.nan)
        out_sy = np.full(n, np.nan)
        out_d = np.full(n, np.nan)
        i = 0
        while i < n:
            if cands[i] is None:
                i += 1
                continue
            j = i
            while j + 1 < n and cands[j + 1] is not None:
                j += 1
            # decode the run [i, j]
            run = range(i, j + 1)
            logp = [-(cands[t0][3] ** 2) / (2 * sigma_m ** 2)
                    for t0 in run]
            back = [None]
            score = logp[0]
            for step, t0 in enumerate(list(run)[1:], start=1):
                prv = cands[t0 - 1]
                cur = cands[t0]
                gc = math.hypot((lon[t0] - lon[t0 - 1]) * mx,
                                (lat[t0] - lat[t0 - 1]) * my)
                sxp = (cur[1][:, None] - prv[1][None, :]) * mx
                syp = (cur[2][:, None] - prv[2][None, :]) * my
                route = np.hypot(sxp, syp)
                trans = -np.abs(route - gc) / beta_m
                tot = score[None, :] + trans
                bi = tot.argmax(1)             # ties -> lowest prev idx
                score = tot[np.arange(cur[0].size), bi] + logp[step]
                back.append(bi)
            # backtrack (ties -> lowest candidate idx = smallest road
            # id at equal distance, by the lexsort order)
            sel = int(score.argmax())
            for step in range(len(back) - 1, -1, -1):
                t0 = i + step
                out_road[t0] = cands[t0][0][sel]
                out_sx[t0] = cands[t0][1][sel]
                out_sy[t0] = cands[t0][2][sel]
                out_d[t0] = cands[t0][3][sel]
                if back[step] is not None:
                    sel = int(back[step][sel])
            i = j + 1
        return pd.DataFrame({
            group_col: pdf[group_col].to_numpy(),
            ts_col: pdf[ts_col].to_numpy(),
            "lon": lon, "lat": lat,
            "road_id": pd.array([None if r < 0 else int(r)
                                 for r in out_road], dtype="Int64"),
            "snap_lon": out_sx, "snap_lat": out_sy,
            "dist_m": out_d})

    return (points.select(group_col, ts_col, lon_col, lat_col)
            .withColumnRenamed(lon_col, "lon")
            .withColumnRenamed(lat_col, "lat")
            .groupBy(group_col).applyInPandas(decode, schema))
