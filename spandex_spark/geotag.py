"""Geotagger (E4, SURVEY.md §2.2): webtext pages → points.

Deterministic, fully JVM-side extraction (regexp + broadcast gazetteer
join — zero Python). Invariant (BASELINE.json:15): ``text`` bytes flow
through untouched; geotagging only READS text; every input row appears in
the output exactly once, rows with no geo signal keep NULL lon/lat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "geo: <lat>, <lon>" decimal token (FIXTURES.md §1 embeds lat first)
GEO_TOKEN_RE = r"geo:\s*(-?\d+\.\d+)\s*,\s*(-?\d+\.\d+)"
PLACE_RE = r"\b(ville\d\d)\b"


def geotag(pages: DataFrame, gazetteer: DataFrame | None = None,
           text_col: str = "text", id_col: str = "url",
           gazetteer_strategy: str = "regex") -> DataFrame:
    """Extract one (lon, lat) per page.

    Priority: explicit ``geo:`` token, else gazetteer place mention, else
    NULL. Output: all input columns + ``lon, lat, tag_source``.

    ``gazetteer_strategy``: 'regex' matches place names with one regexp
    (fine for small gazetteers); 'tokens' tokenizes the text JVM-side,
    explodes DISTINCT tokens, and broadcast-joins them against the
    gazetteer — the scale path for large place tables (no alternation
    blow-up; fan-out bounded by distinct tokens per page).
    """
    out = (pages
           .withColumn("_glat", F.regexp_extract(F.col(text_col), GEO_TOKEN_RE, 1))
           .withColumn("_glon", F.regexp_extract(F.col(text_col), GEO_TOKEN_RE, 2)))
    if gazetteer is not None and gazetteer_strategy == "tokens":
        gaz = F.broadcast(gazetteer.select(
            F.lower(F.col("place")).alias("_tok"),
            F.col("lon").alias("_gaz_lon"),
            F.col("lat").alias("_gaz_lat"),
            F.col("place").alias("_place")))
        toks = pages.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.split(
                F.regexp_replace(F.lower(F.col(text_col)),
                                 r"[^a-z0-9]+", " "),
                " "))).alias("_tok"))
        matches = (toks.join(gaz, "_tok", "inner")
                   .groupBy(id_col)
                   .agg(F.min_by("_gaz_lon", "_place").alias("_gaz_lon"),
                        F.min_by("_gaz_lat", "_place").alias("_gaz_lat")))
        out = out.join(matches, id_col, "left")
    elif gazetteer is not None:
        out = out.withColumn("_place", F.regexp_extract(F.col(text_col), PLACE_RE, 1))
        gaz = F.broadcast(gazetteer.select(
            F.col("place").alias("_place"),
            F.col("lon").alias("_gaz_lon"),
            F.col("lat").alias("_gaz_lat")))
        out = out.join(gaz, "_place", "left")
    else:
        out = (out.withColumn("_gaz_lon", F.lit(None).cast("double"))
                  .withColumn("_gaz_lat", F.lit(None).cast("double")))
    has_tok = F.col("_glat") != ""
    has_gaz = F.col("_gaz_lon").isNotNull()
    out = (out
           .withColumn("lon", F.when(has_tok, F.col("_glon").cast("double"))
                               .otherwise(F.col("_gaz_lon")))
           .withColumn("lat", F.when(has_tok, F.col("_glat").cast("double"))
                               .otherwise(F.col("_gaz_lat")))
           .withColumn("tag_source",
                       F.when(has_tok, F.lit("token"))
                        .when(has_gaz, F.lit("gazetteer"))
                        .otherwise(F.lit(None).cast("string"))))
    return out.drop("_glat", "_glon", "_place", "_gaz_lon", "_gaz_lat")


def geotag_resolved(pages: DataFrame, gazetteer: DataFrame,
                    *, text_col: str = "text", id_col: str = "url",
                    pop_weight: float = 1.0, dist_weight: float = 1.0,
                    scale_km: float = 2000.0,
                    iterations: int = 1) -> DataFrame:
    """Geotagging against an AMBIGUOUS gazetteer — the composition of
    the tokens-strategy mention extractor with
    `operators/toponym.py::resolve_toponyms` (see its docstring for
    the two-pass prior+coherence semantics and weight guidance).

    ``gazetteer`` carries (name, gaz_id, population, lon, lat) with
    possibly MANY rows per name — unlike :func:`geotag`, whose
    injective fixture gazetteer lets min_by pick a location without
    disambiguation.  Every distinct token of a page that matches a
    gazetteer name becomes a mention; the resolver scores candidates
    per page; the page's location is its best-scoring resolved mention
    (score ties: mention asc).  The byte-identity invariant holds —
    text is only read.

    Output: all input columns + lon, lat, place (resolved gazetteer
    name), gaz_id, tag_source ('resolved' | NULL).  Pages with no
    matching mention keep NULL location.
    """
    from spandex_spark.operators.toponym import resolve_toponyms
    toks = pages.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.array_distinct(F.split(
            F.regexp_replace(F.lower(F.col(text_col)),
                             r"[^a-z0-9]+", " "),
            " "))).alias("mention"))
    names = F.broadcast(gazetteer.select(
        F.lower(F.col("name")).alias("mention")).distinct())
    mentions = toks.join(names, "mention")
    resolved = resolve_toponyms(
        mentions, gazetteer, doc_col="_doc", mention_col="mention",
        pop_weight=pop_weight, dist_weight=dist_weight,
        scale_km=scale_km, iterations=iterations)
    from pyspark.sql import Window
    w = Window.partitionBy("_doc").orderBy(F.col("score").desc(),
                                           F.col("mention").asc())
    best = (resolved.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("_doc"),
                    F.col("mention").alias("place"),
                    "gaz_id", "lon", "lat"))
    out = pages.join(best, pages[id_col] == best["_doc"], "left") \
        .drop("_doc")
    return out.withColumn(
        "tag_source",
        F.when(F.col("lon").isNotNull(), F.lit("resolved"))
        .otherwise(F.lit(None).cast("string")))
