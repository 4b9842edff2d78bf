"""Ambiguous-gazetteer geotagging (geotag.py::geotag_resolved):
coherence disambiguation closed form, population fallback, byte
identity of the text column, no-mention NULLs, and best-mention
selection determinism."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.geotag import geotag_resolved

GAZ = [
    ("paris", 1, 25_000.0, 2.35, 48.85),       # FR (small pop)
    ("paris", 2, 2_100_000.0, -95.55, 33.66),  # TX (big pop)
    ("berlin", 3, 3_600_000.0, 13.40, 52.52),
    ("lyon", 4, 500_000.0, 4.83, 45.76),
]


def _gaz(spark):
    return spark.createDataFrame(
        GAZ, "name string, gaz_id long, population double, "
             "lon double, lat double")


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_coherence_disambiguates_page_location(spark):
    pages = _pages(spark, [
        ("u1", "Travel notes: from Paris to Berlin by night train."),
        ("u2", "Paris rodeo weekend."),          # lone mention: pop wins
        ("u3", "nothing geographic here at all."),
    ])
    got = {r.url: r for r in geotag_resolved(pages, _gaz(spark)).collect()}
    # u1: berlin context pulls paris to FR; best mention is the
    # highest-scoring one (berlin, pop leader at zero distance tie)
    assert got["u1"].tag_source == "resolved"
    assert got["u1"].gaz_id in (1, 3)            # a European resolution
    assert got["u1"].lon == pytest.approx(
        {1: 2.35, 3: 13.40}[got["u1"].gaz_id])
    # u2: population prior picks TX
    assert got["u2"].gaz_id == 2
    assert got["u3"].lon is None and got["u3"].tag_source is None


def test_paris_mention_itself_resolves_to_fr_with_context(spark):
    pages = _pages(spark, [("u1", "From Paris to Berlin and Lyon.")])
    from spandex_spark.operators.toponym import resolve_toponyms
    toks = _pages(spark, [("u1", "paris berlin lyon")])
    men = spark.createDataFrame(
        [("u1", "paris"), ("u1", "berlin"), ("u1", "lyon")],
        "doc_id string, mention string")
    r = {x.mention: x.gaz_id for x in resolve_toponyms(
        men, _gaz(spark), doc_col="doc_id").collect()}
    assert r["paris"] == 1                       # coherence recovers FR


def test_text_byte_identity(spark):
    pages = _pages(spark, [("u1", "Paris   has\tweird  whitespace .")])
    out = geotag_resolved(pages, _gaz(spark))
    assert out.select("text").collect()[0].text == \
        "Paris   has\tweird  whitespace ."


def test_every_row_exactly_once(spark):
    pages = _pages(spark, [("u%d" % i, "berlin calling") for i in range(50)]
                   + [("x%d" % i, "no geo") for i in range(50)])
    out = geotag_resolved(pages, _gaz(spark))
    assert out.count() == 100
    assert out.where("tag_source = 'resolved'").count() == 50
