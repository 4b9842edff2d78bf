"""Spatial autocorrelation statistics — Moran's I, LISA, Getis-Ord Gi*.

Reference semantics: the classic ESDA battery every urban-analytics
stack bolts onto its zone tables (PySAL `esda.Moran` / `Moran_Local` /
`G_Local`; ArcGIS "Spatial Autocorrelation" and "Hot Spot Analysis").
The reference's domain (spandex feeds UrbanSim zone/parcel variables,
SURVEY.md §1.1) is exactly where these run: "are home values spatially
clustered, and where are the hot spots?".  Weights here are the
*fixed distance band*: w_ij = 1 iff 0 < dist(i,j) <= radius (Gi* adds
the self-pair, per Getis & Ord 1992), unstandardized.

Spark realization — pure JVM, zero Python, TWO shuffles total:

* neighbor pairs come from operators/distance.py::within_distance_join
  (cell-bucketed equi-join).  The value rides INSIDE the id column as a
  struct (id, val), so pair rows land with both endpoint values and the
  stats need no re-join of the pair list against the table — at 10^12
  rows the pair list is the dominant intermediate and re-keying it by id
  twice would double the shuffle bill;
* global scalars (n, mean, sum of squares) are a 1-row aggregate joined
  back via broadcast — in-plan, never a driver-side count
  (same pattern as textstats.tfidf_top_terms' N);
* Moran's I reduces the ordered-pair list to (S0, sum z_i z_j) plus a
  per-i degree aggregate for the S2 moment — all map-side-combinable;
* Gi* / local Moran aggregate the pair list once per focal id.

Scale shape: pair count is the cost driver (radius chooses it); a dense
mega-cell is an operators/skew.py salting candidate exactly as in
within_distance_join's contract.  Everything downstream of the pair
join is sum/count aggregates Catalyst partial-aggregates map-side.

Formulas (Cliff & Ord 1981; Getis & Ord 1992, star variant):
  I  = (n/S0) * sum_ij w_ij z_i z_j / sum_i z_i^2,   z_i = x_i - xbar
  E[I] = -1/(n-1)
  Var_N[I] = (n^2 S1 - n S2 + 3 S0^2) / ((n^2-1) S0^2) - E[I]^2
    with binary symmetric weights: S1 = 2 S0, S2 = sum_i (2 deg_i)^2
  I_i = z_i / m2 * sum_j w_ij z_j,  m2 = sum_k z_k^2 / n
  Gi* = (sum_j w_ij x_j - xbar W_i) / (S sqrt((n W_i - W_i^2)/(n-1))),
    S = sqrt(sum x^2/n - xbar^2), self included in W_i.

`metric='planar'` keeps every operand FP-reproducible in ANSI SQL, so a
brute-force cross-join oracle replicates results bit-for-bit (the
within_distance_join parity convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spandex_spark.operators.distance import within_distance_join

__all__ = ["morans_i", "local_morans_i", "getis_ord_gi_star"]


def _tagged(df: DataFrame, id_col: str, value_col: str,
            lon_col: str, lat_col: str) -> DataFrame:
    """Rows keyed by a (id, val) struct so the pair join carries values."""
    return df.select(
        F.struct(F.col(id_col).alias("id"),
                 F.col(value_col).cast("double").alias("val")).alias("_iv"),
        F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"))


def _pairs(df: DataFrame, *, radius: float, id_col: str, value_col: str,
           lon_col: str, lat_col: str, metric: str,
           include_self: bool) -> DataFrame:
    """Ordered neighbor pairs (i_id, i_val, j_id, j_val, dist)."""
    t = _tagged(df, id_col, value_col, lon_col, lat_col)
    pr = within_distance_join(
        t, t.withColumnRenamed("_iv", "_jv"),
        radius=radius, point_id_col="_iv", feature_id_col="_jv",
        p_lon="lon", p_lat="lat", f_lon="lon", f_lat="lat", metric=metric)
    if not include_self:
        pr = pr.filter(F.col("_iv.id") != F.col("_jv.id"))
    return pr.select(F.col("_iv.id").alias("i_id"),
                     F.col("_iv.val").alias("i_val"),
                     F.col("_jv.id").alias("j_id"),
                     F.col("_jv.val").alias("j_val"))


def _global_stats(df: DataFrame, value_col: str) -> DataFrame:
    """One broadcastable row: n, xbar, ssq (= sum x^2, NOT centered)."""
    x = F.col(value_col).cast("double")
    return df.agg(F.count(x).alias("n"), F.avg(x).alias("xbar"),
                  F.sum(x * x).alias("ssq"))


def morans_i(df: DataFrame, *, radius: float, value_col: str,
             id_col: str, lon_col: str = "lon", lat_col: str = "lat",
             metric: str = "planar") -> DataFrame:
    """Global Moran's I under a fixed distance band, with the
    normality-assumption z-score.  ONE row out:
    (n, s0, morans_i, expected_i, variance, z_score).

    Degenerate inputs surface as NULLs, never exceptions: a constant
    surface (sum z^2 = 0) or an empty weight matrix (S0 = 0) NULLs the
    statistic — PySAL raises/NaNs here; NULL is the engine's convention
    for "undefined on this input" (operators/buffer.py precedent).
    """
    pr = _pairs(df, radius=radius, id_col=id_col, value_col=value_col,
                lon_col=lon_col, lat_col=lat_col, metric=metric,
                include_self=False)
    st = F.broadcast(_global_stats(df, value_col))
    # the pair list is the cost driver, so it is consumed EXACTLY ONCE:
    # num = sum_ij z_i z_j = sum_i z_i * lag_i, and S0/S2 both derive
    # from the same per-i degree — one (i_id) aggregate feeds a 1-row
    # reduce (two aggregates over the pair list would re-run the join)
    per = (pr.crossJoin(st)
           .groupBy("i_id")
           .agg(F.first("i_val").alias("_xi"),
                F.first("xbar").alias("_xb"),
                F.count(F.lit(1)).alias("deg"),
                F.sum(F.col("j_val") - F.col("xbar")).alias("_lagz")))
    red = per.agg(
        F.sum("deg").cast("double").alias("s0"),
        F.sum((F.col("_xi") - F.col("_xb")) * F.col("_lagz"))
        .alias("num"),
        F.sum(F.pow(F.lit(2.0) * F.col("deg"), F.lit(2.0))).alias("s2"))
    n = F.col("n").cast("double")
    den = F.col("ssq") - n * F.col("xbar") * F.col("xbar")  # sum z^2
    e_i = F.lit(-1.0) / (n - F.lit(1.0))
    s0 = F.coalesce(F.col("s0"), F.lit(0.0))
    i_stat = F.when((s0 > 0) & (den > 0),
                    (n / s0) * F.col("num") / den)
    s1 = F.lit(2.0) * s0
    var = F.when(
        (s0 > 0) & (n > 2),
        (n * n * s1 - n * F.col("s2") + F.lit(3.0) * s0 * s0)
        / ((n * n - F.lit(1.0)) * s0 * s0) - e_i * e_i)
    out = (red.crossJoin(st)
           .select(F.col("n"), s0.alias("s0"),
                   i_stat.alias("morans_i"), e_i.alias("expected_i"),
                   var.alias("variance")))
    return out.withColumn(
        "z_score",
        F.when(F.col("variance") > 0,
               (F.col("morans_i") - F.col("expected_i"))
               / F.sqrt(F.col("variance"))))


def local_morans_i(df: DataFrame, *, radius: float, value_col: str,
                   id_col: str, lon_col: str = "lon",
                   lat_col: str = "lat",
                   metric: str = "planar") -> DataFrame:
    """Local Moran (Anselin 1995 LISA): per-feature
    I_i = z_i * (sum_j w_ij z_j) / m2, m2 = sum_k z_k^2 / n, plus the
    Moran-scatterplot quadrant ('HH'|'LL'|'HL'|'LH') — the cluster/
    outlier map.  Features with no neighbors keep I_i = 0 and quadrant
    NULL (an empty spatial lag is 0, not undefined, matching PySAL's
    sparse dot product).  Output: (id_col, value_col, lisa_i, quadrant,
    n_neighbors).
    """
    pr = _pairs(df, radius=radius, id_col=id_col, value_col=value_col,
                lon_col=lon_col, lat_col=lat_col, metric=metric,
                include_self=False)
    st = F.broadcast(_global_stats(df, value_col))
    lag = (pr.crossJoin(st)
           .groupBy("i_id")
           .agg(F.sum(F.col("j_val") - F.col("xbar")).alias("lag_z"),
                F.count(F.lit(1)).alias("n_neighbors")))
    base = (df.select(F.col(id_col), F.col(value_col))
            .join(lag.withColumnRenamed("i_id", id_col), id_col, "left")
            .crossJoin(st))
    n = F.col("n").cast("double")
    m2 = (F.col("ssq") - n * F.col("xbar") * F.col("xbar")) / n
    zi = F.col(value_col).cast("double") - F.col("xbar")
    lagz = F.coalesce(F.col("lag_z"), F.lit(0.0))
    lisa = F.when(m2 > 0, zi / m2 * lagz)
    quad = (F.when(F.col("lag_z").isNull(), F.lit(None).cast("string"))
            .when((zi >= 0) & (lagz >= 0), F.lit("HH"))
            .when((zi < 0) & (lagz < 0), F.lit("LL"))
            .when(zi >= 0, F.lit("HL"))
            .otherwise(F.lit("LH")))
    return base.select(
        F.col(id_col), F.col(value_col), lisa.alias("lisa_i"),
        quad.alias("quadrant"),
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"))


def getis_ord_gi_star(df: DataFrame, *, radius: float, value_col: str,
                      id_col: str, lon_col: str = "lon",
                      lat_col: str = "lat",
                      metric: str = "planar") -> DataFrame:
    """Getis-Ord Gi* hot-spot z-score per feature (self-inclusive star
    variant — every feature has W_i >= 1, so isolated features get a
    well-defined score from their own value).  Output: (id_col,
    value_col, gi_star, n_neighbors) where n_neighbors counts the self
    pair.  W_i = n (every feature within radius of i) zeroes the
    variance term → gi_star NULL for that row.
    """
    pr = _pairs(df, radius=radius, id_col=id_col, value_col=value_col,
                lon_col=lon_col, lat_col=lat_col, metric=metric,
                include_self=True)
    st = F.broadcast(_global_stats(df, value_col))
    per = (pr.groupBy("i_id")
           .agg(F.sum("j_val").alias("wx"),
                F.count(F.lit(1)).alias("wi"))
           .crossJoin(st))
    n = F.col("n").cast("double")
    wi = F.col("wi").cast("double")
    s = F.sqrt(F.col("ssq") / n - F.col("xbar") * F.col("xbar"))
    denom_in = (n * wi - wi * wi) / (n - F.lit(1.0))
    gi = F.when((denom_in > 0) & (s > 0),
                (F.col("wx") - F.col("xbar") * wi) / (s * F.sqrt(denom_in)))
    scored = per.select(F.col("i_id").alias(id_col), gi.alias("gi_star"),
                        F.col("wi").alias("n_neighbors"))
    return (df.select(id_col, value_col)
            .join(scored, id_col, "left"))
