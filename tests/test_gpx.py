"""GPX parsing (sources/gpx.py::parse_gpx): spec-shaped fixture with
two segments, optional ele/time, self-closing trkpt, attribute-order
and quote-style variance, NULL/binary inputs, waypoint-only files
emitting nothing, and composition with trajectory.trip_stats."""

from datetime import datetime

from pyspark.sql import functions as F

from spandex_spark.sources.gpx import parse_gpx

GPX = """<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1">
 <wpt lat="9.9" lon="9.8"><name>not a trackpoint</name></wpt>
 <trk><name>ride</name>
  <trkseg>
   <trkpt lat="48.100" lon="11.500"><ele>520.5</ele>
     <time>2026-03-01T10:00:00Z</time></trkpt>
   <trkpt lon='11.510' lat='48.101'><time>2026-03-01T10:01:00Z</time></trkpt>
   <trkpt lat="48.102" lon="11.520"/>
  </trkseg>
  <trkseg>
   <trkpt lat="48.200" lon="11.600"><ele>530</ele></trkpt>
  </trkseg>
 </trk>
</gpx>"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "track_id long, gpx string")


def test_parse_closed_form(spark):
    rows = parse_gpx(_df(spark, [(1, GPX)])).collect()
    assert len(rows) == 4                       # waypoint excluded
    by = {(r.seg, r.seq): r for r in rows}
    assert by[(0, 0)].lon == 11.5 and by[(0, 0)].lat == 48.1
    assert by[(0, 0)].ele == 520.5
    assert by[(0, 0)].ts == datetime(2026, 3, 1, 10, 0, 0)
    assert by[(0, 1)].ele is None               # no ele, attrs swapped
    assert by[(0, 1)].ts == datetime(2026, 3, 1, 10, 1, 0)
    assert by[(0, 2)].ts is None and by[(0, 2)].ele is None  # self-closing
    assert by[(1, 0)].seg == 1 and by[(1, 0)].ele == 530.0


def test_null_binary_and_trackless(spark):
    import pyspark.sql.types as T
    df = spark.createDataFrame(
        [(1, bytearray(GPX.encode())), (2, None),
         (3, b"<gpx><wpt lat='1' lon='2'/></gpx>")],
        T.StructType([T.StructField("track_id", T.LongType()),
                      T.StructField("gpx", T.BinaryType())]))
    rows = parse_gpx(df).collect()
    assert {r.track_id for r in rows} == {1}
    assert len(rows) == 4


def test_composes_with_trip_stats(spark):
    from spandex_spark.operators.trajectory import trip_stats
    pts = parse_gpx(_df(spark, [(1, GPX)])).where(F.col("ts").isNotNull())
    out = trip_stats(pts, group_col="track_id").collect()
    assert len(out) == 1 and out[0].track_id == 1


def test_map_only_plan(spark):
    out = parse_gpx(_df(spark, [(1, GPX)]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "Exchange"):
        assert op not in plan
