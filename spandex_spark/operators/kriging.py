"""Ordinary kriging — geostatistical interpolation with a fitted
variogram, the model-based sibling of ``interpolate.idw_grid``.

Reference semantics: `v.krige` / ArcGIS "Kriging (ordinary)" /
gstat's ``krige()``: an empirical semivariogram from point pairs, a
parametric model fit (exponential/spherical/gaussian), then per-cell
best-linear-unbiased prediction from the k nearest neighbors, with the
kriging variance alongside — the one thing IDW cannot give.

Spark realization in three bounded stages:

* :func:`empirical_variogram` — the pair join reuses
  ``distance.within_distance_join`` (cell-bucketed, planar metric), so
  pair count = points × neighbors-in-max_dist, never the cross product;
  binning + 0.5·mean((Δv)²) is one JVM aggregate.
* :func:`fit_variogram` — the binned curve is n_lags rows (model-sized,
  collected like k-means centroids): for each candidate range the model
  is LINEAR in (nugget, partial sill), so the fit is an exact
  pair-weighted least squares per range on a log-spaced range grid —
  deterministic, no iterative optimizer.
* :func:`kriging_grid` — neighbors gather through the same cell-bucketed
  join with coords+value riding in the id struct (interpolate.py
  pattern); each output cell groups its ≤max_neighbors nearest
  (deterministic (dist, px, py) tie-break) and solves the (k+1)×(k+1)
  ordinary-kriging system in a numpy batch kernel (applyInPandas per
  cell).  Cost ∝ cells × k³ with k ≤ 16 — the standard "local kriging"
  operating point; global kriging (one n×n solve) is explicitly NOT
  offered because it cannot scale.

Exactly-coincident neighbors are pre-averaged in the kernel (a
duplicate point makes the Γ matrix singular); cells with no neighbor in
radius come back NULL like IDW's undefined cells.  γ(h) = nugget +
psill·f(h/range) with f_exp = 1−exp(−3h/a), f_sph = 1.5u−0.5u³ (1
beyond a), f_gau = 1−exp(−3h²/a²) — the gstat conventions ("effective
range" scaling), mirrored verbatim by the in-test reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spandex_spark.operators.distance import within_distance_join
from spandex_spark.operators.interpolate import _lattice

__all__ = ["empirical_variogram", "fit_variogram", "kriging_grid",
           "variogram_value"]


def _model_f(model: str, h, a):
    """Unit-sill variogram shape f(h; a) — numpy-vectorized."""
    h = np.asarray(h, dtype=np.float64)
    if model == "exponential":
        return 1.0 - np.exp(-3.0 * h / a)
    if model == "spherical":
        u = np.minimum(h / a, 1.0)
        return 1.5 * u - 0.5 * u ** 3
    if model == "gaussian":
        return 1.0 - np.exp(-3.0 * (h / a) ** 2)
    raise ValueError(f"unknown variogram model {model!r}")


def variogram_value(params: dict, h):
    """γ(h) for a fitted params dict {model, nugget, psill, range};
    γ(0) = 0 exactly (measurement at the point itself)."""
    h = np.asarray(h, dtype=np.float64)
    g = params["nugget"] + params["psill"] * _model_f(
        params["model"], h, params["range"])
    return np.where(h <= 0.0, 0.0, g)


def empirical_variogram(points: DataFrame, *, value_col: str,
                        id_col: str, max_dist: float, n_lags: int = 12,
                        lon_col: str = "lon",
                        lat_col: str = "lat") -> DataFrame:
    """Binned semivariogram: (lag, mean_h, gamma, n_pairs) over all
    point pairs within ``max_dist`` (planar degrees).  Ordered pairs
    count each unordered pair twice — identically in every bin, so
    gamma is unaffected and the join stays symmetric."""
    def _side(name):
        return points.select(
            F.struct(F.col(id_col).alias("id"),
                     F.col(lon_col).alias("x"), F.col(lat_col).alias("y"),
                     F.col(value_col).cast("double").alias("v"))
            .alias(name))
    pairs = within_distance_join(
        _side("pa"), _side("pb"), radius=float(max_dist), metric="planar",
        point_id_col="pa", feature_id_col="pb",
        p_lon="pa.x", p_lat="pa.y", f_lon="pb.x", f_lat="pb.y")
    w = float(max_dist) / int(n_lags)
    return (pairs
            .filter(F.col("pa")["id"] != F.col("pb")["id"])
            .select(F.col("pa")["v"].alias("va"),
                    F.col("pb")["v"].alias("vb"), F.col("dist"))
            .withColumn("lag", F.least(
                F.lit(int(n_lags) - 1),
                F.floor(F.col("dist") / F.lit(w))).cast("int"))
            .groupBy("lag")
            .agg(F.avg("dist").alias("mean_h"),
                 (F.avg((F.col("va") - F.col("vb")) ** 2) / 2.0)
                 .alias("gamma"),
                 F.count("*").alias("n_pairs"))
            .orderBy("lag"))


def fit_variogram(emp: DataFrame, *, model: str = "exponential",
                  n_range_grid: int = 40) -> dict:
    """Pair-weighted least squares: for each candidate range a (log grid
    from min to 2×max observed lag distance), solve the LINEAR system
    for (nugget ≥ 0, psill ≥ 0) exactly; keep the lowest weighted SSE.
    Deterministic; returns {model, nugget, psill, range, sse}."""
    rows = emp.select("mean_h", "gamma", "n_pairs").collect()  # collect-ok: n_lags-row model fit (k-means-centroid precedent)
    h = np.array([r["mean_h"] for r in rows])
    g = np.array([r["gamma"] for r in rows])
    wt = np.array([r["n_pairs"] for r in rows], dtype=np.float64)
    if len(h) < 3:
        raise ValueError("need >= 3 variogram bins to fit")
    best = None
    for a in np.geomspace(max(h.min(), 1e-12), 2.0 * h.max(),
                          int(n_range_grid)):
        fa = _model_f(model, h, a)
        X = np.column_stack([np.ones_like(h), fa])
        W = np.sqrt(wt)
        coef, *_ = np.linalg.lstsq(X * W[:, None], g * W, rcond=None)
        nug, ps = max(0.0, float(coef[0])), max(0.0, float(coef[1]))
        sse = float(np.sum(wt * (nug + ps * fa - g) ** 2))
        if best is None or sse < best["sse"]:
            best = {"model": model, "nugget": nug, "psill": ps,
                    "range": float(a), "sse": sse}
    return best


_KRIG_SCHEMA = T.StructType([
    T.StructField("gx", T.IntegerType()),
    T.StructField("gy", T.IntegerType()),
    T.StructField("pred", T.DoubleType()),
    T.StructField("variance", T.DoubleType()),
])


def kriging_grid(points: DataFrame, *, value_col: str,
                 variogram: dict,
                 origin_x: float, origin_y: float, step: float,
                 nx: int, ny: int, radius: float,
                 max_neighbors: int = 16,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Ordinary-kriging surface on the engine lattice: one row per cell
    with (gx, gy, pred, variance); cells with no neighbor in ``radius``
    are NULL/NULL."""
    spark = points.sparkSession
    lat = _lattice(spark, origin_x, origin_y, step, nx, ny)
    cells = lat.select(F.struct("gx", "gy", "cx", "cy").alias("cell"))
    pts = points.select(F.struct(
        F.col(lon_col).alias("x"), F.col(lat_col).alias("y"),
        F.col(value_col).cast("double").alias("v")).alias("pt"))
    pairs = within_distance_join(
        cells, pts, radius=float(radius), metric="planar",
        point_id_col="cell", feature_id_col="pt",
        p_lon="cell.cx", p_lat="cell.cy", f_lon="pt.x", f_lat="pt.y")
    ca, cb = pairs.columns[0], pairs.columns[1]
    gathered = pairs.select(
        F.col(ca)["gx"].alias("gx"), F.col(ca)["gy"].alias("gy"),
        F.col(cb)["x"].alias("px"), F.col(cb)["y"].alias("py"),
        F.col(cb)["v"].alias("v"), F.col("dist").alias("d0"))

    vg = dict(variogram)
    k = int(max_neighbors)

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        gx, gy = int(pdf["gx"].iloc[0]), int(pdf["gy"].iloc[0])
        pdf = pdf.sort_values(["d0", "px", "py"]).head(4 * k)
        px = pdf["px"].to_numpy()
        py = pdf["py"].to_numpy()
        v = pdf["v"].to_numpy()
        d0 = pdf["d0"].to_numpy()
        # pre-average exactly-coincident points (singular Γ otherwise)
        key = np.stack([px, py], axis=1)
        _, idx, inv = np.unique(key, axis=0, return_index=True,
                                return_inverse=True)
        if len(idx) < len(px):
            vm = np.zeros(len(idx))
            np.add.at(vm, inv, v)
            cnt = np.zeros(len(idx))
            np.add.at(cnt, inv, 1.0)
            v, px, py, d0 = vm / cnt, px[idx], py[idx], d0[idx]
            order = np.lexsort((py, px, d0))
            px, py, v, d0 = px[order], py[order], v[order], d0[order]
        px, py, v, d0 = px[:k], py[:k], v[:k], d0[:k]
        n = len(v)
        dx = px[:, None] - px[None, :]
        dy = py[:, None] - py[None, :]
        hmat = np.hypot(dx, dy)
        A = np.zeros((n + 1, n + 1))
        A[:n, :n] = variogram_value(vg, hmat)
        A[:n, n] = 1.0
        A[n, :n] = 1.0
        rhs = np.zeros(n + 1)
        rhs[:n] = variogram_value(vg, d0)
        rhs[n] = 1.0
        try:
            lam = np.linalg.solve(A, rhs)
        except np.linalg.LinAlgError:
            lam, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        pred = float(lam[:n] @ v)
        var = float(lam[:n] @ rhs[:n] + lam[n])
        return pd.DataFrame([{"gx": gx, "gy": gy, "pred": pred,
                              "variance": max(0.0, var)}])

    solved = gathered.groupBy("gx", "gy").applyInPandas(
        _solve, schema=_KRIG_SCHEMA)
    return (lat.select("gx", "gy", "cx", "cy")
            .join(solved, ["gx", "gy"], "left"))
