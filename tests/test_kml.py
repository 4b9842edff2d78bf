"""KML parsing (sources/kml.py::parse_kml): point/line/polygon-with-
hole closed forms (ring orientation per the loader contract, altitude
dropped), MultiGeometry, names, NULL contracts, and composition with
the geometry operators (area + PIP tag parity)."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.sources.kml import parse_kml

KML = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Placemark><name>pt</name>
  <Point><coordinates>11.5,48.1,520.0</coordinates></Point></Placemark>
 <Placemark><name>ln</name>
  <LineString><coordinates>
    0,0,0 1,0,0 1,1,0
  </coordinates></LineString></Placemark>
 <Placemark><name>donut</name>
  <Polygon>
   <outerBoundaryIs><LinearRing><coordinates>
     0,0 4,0 4,4 0,4 0,0
   </coordinates></LinearRing></outerBoundaryIs>
   <innerBoundaryIs><LinearRing><coordinates>
     1,1 3,1 3,3 1,3 1,1
   </coordinates></LinearRing></innerBoundaryIs>
  </Polygon></Placemark>
 <Placemark><name>empty</name></Placemark>
</Document></kml>"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, kml string")


def test_closed_forms(spark):
    rows = {r.pm: r for r in parse_kml(_df(spark, [(1, KML)])).collect()}
    assert len(rows) == 4
    pt = rows[0]
    assert pt.name == "pt" and pt.geom["kind"] == 1
    assert pt.geom["xs"] == [11.5] and pt.geom["ys"] == [48.1]  # alt dropped
    ln = rows[1]
    assert ln.geom["kind"] == 2 and len(ln.geom["xs"]) == 3
    dn = rows[2]
    assert dn.geom["kind"] in (3, 6)
    assert len(dn.geom["ring_offsets"]) == 3          # outer + hole
    assert rows[3].geom is None and rows[3].name == "empty"


def test_polygon_area_with_hole(spark):
    from spandex_spark.functions.spatial import geom_area_udf
    g = parse_kml(_df(spark, [(1, KML)])).where(F.col("pm") == 2)
    area = g.select(geom_area_udf(F.col("geom")).alias("area")) \
        .collect()[0]["area"]
    assert area == pytest.approx(16.0 - 4.0, abs=1e-9)


def test_pip_tag_parity(spark):
    # tag the point placemark against the donut placemark: (11.5,48.1)
    # is OUTSIDE; a point at (0.5, 0.5) is inside the outer ring but
    # NOT in the hole
    from spandex_spark.operators import tag_points
    zones = (parse_kml(_df(spark, [(1, KML)])).where(F.col("pm") == 2)
             .select(F.lit(10).alias("zone_id"), "geom"))
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.0, 2.0), (3, 11.5, 48.1)],
        "pt_id long, lon double, lat double")
    got = {r.pt_id: r.zone_id for r in
           tag_points(pts, zones, poly_id_col="zone_id",
                      point_id_col="pt_id", level=8).collect()}
    assert got[1] == 10          # in the ring
    assert got[2] is None        # in the hole
    assert got[3] is None        # far outside


def test_null_and_binary(spark):
    import pyspark.sql.types as T
    df = spark.createDataFrame(
        [(1, bytearray(KML.encode())), (2, None)],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("kml", T.BinaryType())]))
    rows = parse_kml(df).collect()
    assert {r.doc_id for r in rows} == {1} and len(rows) == 4
