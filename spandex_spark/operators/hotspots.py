"""Emerging hot spot analysis — the ArcGIS "space-time cube" battery
(Gi* per time slice + Mann-Kendall trend per location) as pure
DataFrame algebra.  Companion to `spatialstats.getis_ord_gi_star`
(the single-slice statistic) for the question that tool can't answer:
not "where is it hot" but "where is it GETTING hot" — emerging topics
per region, growing crawl coverage, spreading activity.

Semantics (Getis & Ord 1992; Mann 1945 / Kendall 1975; the ESRI
Emerging Hot Spot Analysis composition, reduced taxonomy):

1. events bin to a zero-filled space-time cube over the OCCUPIED
   spatial extent: cell = (floor(lon/cell), floor(lat/cell)), slice =
   caller-provided integer time bin; value = count (or sum of
   ``value_col``).  Zero-filling matters — a cell absent from one
   slice is a zero observation, not a missing one, or every trend
   biases upward.
2. per-slice Gi* on the GRID: the neighborhood is the (2r+1)² cell
   block (including self, the star), realized as an exploded
   neighbor-offset EQUI-JOIN on (cell, slice) — no distance join, no
   Python; edge cells naturally have smaller W_i.
3. per-cell Mann-Kendall over the z(t) series: S = Σ_{t1<t2}
   sign(z_t2 − z_t1) via a slice-pair self-join per cell (≤ S²/2 rows
   per cell, S = #slices is bounded and small), tie-corrected variance
   [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18, continuity-corrected
   Z_MK.
4. reduced category (documented; ArcGIS ships 17): sign of the mean
   Gi* picks hot/cold, the MK trend at ``alpha`` picks
   intensifying/diminishing (trend sign aligned/opposed to the
   temperature) else persistent; cells whose |mean Gi*| < z_alpha are
   "no pattern".

Scale shape: the cube is (occupied cells × slices) rows — slices are
bounded (weekly bins of a decade ≈ 522), so the cube is cell-table-
sized, NOT event-sized; everything after the first binning groupBy is
proportional to it.  The neighbor explode fans (2r+1)² per cube row;
the MK self-join fans S per cube row.  All joins are equi-joins on
(cell, slice) keys; zero Python operators end-to-end (plan-audited).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["emerging_hotspots"]


def emerging_hotspots(events: DataFrame, *, cell_size: float,
                      slice_col: str, value_col: str | None = None,
                      lon_col: str = "lon", lat_col: str = "lat",
                      radius_cells: int = 1,
                      alpha: float = 0.05) -> DataFrame:
    """(cell_x, cell_y, mean_gi, mk_s, mk_z, trend, category) per
    occupied spatial cell.  ``slice_col`` must be an integer time-bin
    column (bin upstream: e.g. weekofyear, months since epoch);
    ``trend`` is 'increasing' / 'decreasing' / 'none' at ``alpha``;
    ``category`` ∈ {intensifying|persistent|diminishing} × {hot|cold}
    ∪ {'no pattern'}."""
    if cell_size <= 0:
        raise ValueError("cell_size must be > 0")
    if radius_cells < 1:
        raise ValueError("radius_cells must be >= 1")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    # z_{1-alpha/2} via the Acklam/Moro-style rational approximation is
    # overkill here: the classification thresholds people actually run
    # are covered by a small exact table; interpolate between them.
    _ZTAB = [(0.20, 1.2815515655), (0.10, 1.6448536270),
             (0.05, 1.9599639845), (0.02, 2.3263478740),
             (0.01, 2.5758293035), (0.001, 3.2905267314)]
    zc = None
    for (a1, z1), (a2, z2) in zip(_ZTAB, _ZTAB[1:]):
        if a2 <= alpha <= a1:
            w = (a1 - alpha) / (a1 - a2)
            zc = z1 + w * (z2 - z1)
            break
    if zc is None:
        zc = _ZTAB[0][1] if alpha > 0.20 else _ZTAB[-1][1]

    val = (F.col(value_col).cast("double") if value_col
           else F.lit(1.0))
    binned = (events.select(
        F.floor(F.col(lon_col) / cell_size).alias("cell_x"),
        F.floor(F.col(lat_col) / cell_size).alias("cell_y"),
        F.col(slice_col).cast("long").alias("_t"),
        val.alias("_v"))
        .groupBy("cell_x", "cell_y", "_t")
        .agg(F.sum("_v").alias("_v")))
    cells = binned.select("cell_x", "cell_y").distinct()
    slices = binned.select("_t").distinct()
    # zero-filled cube: occupied extent x all slices
    cube = (cells.crossJoin(F.broadcast(slices))
            .join(binned, ["cell_x", "cell_y", "_t"], "left")
            .select("cell_x", "cell_y", "_t",
                    F.coalesce(F.col("_v"), F.lit(0.0)).alias("_v")))

    # ---- per-slice Gi* over the grid neighborhood --------------------
    r = int(radius_cells)
    offs = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]
    nbr = (cube.select(
        F.explode(F.array(*[
            F.struct((F.col("cell_x") + dx).alias("cell_x"),
                     (F.col("cell_y") + dy).alias("cell_y"))
            for dx, dy in offs])).alias("_c"),
        "_t", "_v")
        .select("_c.cell_x", "_c.cell_y", "_t", "_v"))
    per = (cube.select("cell_x", "cell_y", "_t")
           .join(nbr, ["cell_x", "cell_y", "_t"])
           .groupBy("cell_x", "cell_y", "_t")
           .agg(F.sum("_v").alias("_wx"), F.count(F.lit(1)).alias("_wi")))
    st = (cube.groupBy("_t")
          .agg(F.count(F.lit(1)).alias("_n"), F.avg("_v").alias("_xbar"),
               (F.sum(F.col("_v") * F.col("_v"))
                / F.count(F.lit(1))).alias("_msq")))
    n = F.col("_n").cast("double")
    wi = F.col("_wi").cast("double")
    s = F.sqrt(F.col("_msq") - F.col("_xbar") * F.col("_xbar"))
    denom_in = (n * wi - wi * wi) / (n - F.lit(1.0))
    gi = F.when((denom_in > 0) & (s > 0),
                (F.col("_wx") - F.col("_xbar") * wi)
                / (s * F.sqrt(denom_in)))
    zs = (per.join(F.broadcast(st), "_t")
          .select("cell_x", "cell_y", "_t",
                  F.coalesce(gi, F.lit(0.0)).alias("_z")))

    # ---- Mann-Kendall per cell over the z(t) series -------------------
    a = zs.select("cell_x", "cell_y", F.col("_t").alias("_t1"),
                  F.col("_z").alias("_z1"))
    b = zs.select("cell_x", "cell_y", F.col("_t").alias("_t2"),
                  F.col("_z").alias("_z2"))
    mk = (a.join(b, ["cell_x", "cell_y"])
          .where(F.col("_t1") < F.col("_t2"))
          .groupBy("cell_x", "cell_y")
          .agg(F.sum(F.signum(F.col("_z2") - F.col("_z1"))).alias("mk_s")))
    ties = (zs.groupBy("cell_x", "cell_y", "_z")
            .agg(F.count(F.lit(1)).alias("_tg"))
            .groupBy("cell_x", "cell_y")
            .agg(F.sum(F.col("_tg") * (F.col("_tg") - 1)
                       * (2 * F.col("_tg") + 5)).alias("_tie")))
    ns = zs.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("_ns"), F.avg("_z").alias("mean_gi"))
    nn = F.col("_ns").cast("double")
    var = ((nn * (nn - 1) * (2 * nn + 5) - F.col("_tie")) / F.lit(18.0))
    mkz = F.when(var <= 0, F.lit(0.0)).otherwise(
        F.when(F.col("mk_s") > 0, (F.col("mk_s") - 1) / F.sqrt(var))
        .when(F.col("mk_s") < 0, (F.col("mk_s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0)))
    # LEFT joins with zero defaults: with a single time slice the MK
    # pair join is empty, and an inner join here would silently return
    # ZERO rows instead of per-cell 'no trend' rows (review-found)
    out = (ns.join(mk, ["cell_x", "cell_y"], "left")
           .join(ties, ["cell_x", "cell_y"], "left")
           .withColumn("mk_s", F.coalesce(F.col("mk_s"), F.lit(0.0)))
           .withColumn("_tie", F.coalesce(F.col("_tie"), F.lit(0)))
           .withColumn("mk_z", mkz))
    trend = (F.when(F.col("mk_z") > zc, F.lit("increasing"))
             .when(F.col("mk_z") < -zc, F.lit("decreasing"))
             .otherwise(F.lit("none")))
    out = out.withColumn("trend", trend)
    hot = F.col("mean_gi") > 0
    sig = F.abs(F.col("mean_gi")) >= zc
    aligned = F.when(hot, F.col("trend") == "increasing") \
        .otherwise(F.col("trend") == "decreasing")
    opposed = F.when(hot, F.col("trend") == "decreasing") \
        .otherwise(F.col("trend") == "increasing")
    temp = F.when(hot, F.lit("hot")).otherwise(F.lit("cold"))
    category = (F.when(~sig, F.lit("no pattern"))
                .when(aligned, F.concat(F.lit("intensifying "), temp))
                .when(opposed, F.concat(F.lit("diminishing "), temp))
                .otherwise(F.concat(F.lit("persistent "), temp)))
    return out.select("cell_x", "cell_y", "mean_gi", "mk_s", "mk_z",
                      "trend", category.alias("category"))
