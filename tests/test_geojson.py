"""GeoJSON interop (RFC 7946): golden objects, codec agreement with
WKB/WKT, column codecs, and FeatureCollection file IO."""

import json

import numpy as np
import pytest

from spandex_spark.sources.geojson import (from_geojson, geojson_to_geom,
                                           geom_to_geojson, read_geojson,
                                           to_geojson, write_geojson)


def _poly(xs, ys, offs=None):
    xs = list(map(float, xs)); ys = list(map(float, ys))
    return {"kind": 3 if offs is None or len(offs) <= 2 else 6,
            "xs": xs, "ys": ys,
            "ring_offsets": offs or [0, len(xs)],
            "bbox": {"minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)}}


class TestGolden:
    def test_point(self):
        g = {"kind": 1, "xs": [1.0], "ys": [2.5], "ring_offsets": [0, 1],
             "bbox": {"minx": 1.0, "miny": 2.5, "maxx": 1.0, "maxy": 2.5}}
        assert geom_to_geojson(g) == {"type": "Point",
                                      "coordinates": [1.0, 2.5]}
        assert geojson_to_geom('{"type":"Point","coordinates":[1,2.5]}') \
            ["xs"] == [1.0]

    def test_polygon_hole_closed_rings(self):
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2], [0, 0, 4, 4, 1, 2, 2, 1],
                  offs=[0, 4, 8])
        obj = geom_to_geojson(g)
        assert obj["type"] == "Polygon"
        assert len(obj["coordinates"]) == 2
        assert obj["coordinates"][0][0] == obj["coordinates"][0][-1]
        back = geojson_to_geom(obj)
        assert back["ring_offsets"] == [0, 4, 8]
        assert back["xs"] == g["xs"] and back["ys"] == g["ys"]

    def test_multipolygon_and_lines(self):
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2, 10, 12, 12, 10],
                  [0, 0, 4, 4, 1, 2, 2, 1, 0, 0, 2, 2],
                  offs=[0, 4, 8, 12])
        obj = geom_to_geojson(g)
        assert obj["type"] == "MultiPolygon" and len(obj["coordinates"]) == 2
        assert geojson_to_geom(obj)["xs"] == g["xs"]
        ml = {"kind": 2, "xs": [0.0, 1.0, 5.0, 6.0],
              "ys": [0.0, 1.0, 5.0, 5.0], "ring_offsets": [0, 2, 4],
              "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 6.0, "maxy": 5.0}}
        o2 = geom_to_geojson(ml)
        assert o2["type"] == "MultiLineString"
        assert geojson_to_geom(o2)["ring_offsets"] == [0, 2, 4]

    def test_feature_unwrap_orientation_and_errors(self):
        # CW exterior violates RFC 7946 but appears in the wild — renormalize
        cw = {"type": "Polygon", "coordinates": [
            [[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]]]}
        g = geojson_to_geom({"type": "Feature", "geometry": cw,
                             "properties": {}})
        from spandex_spark.geom import shoelace_area
        assert shoelace_area(np.asarray(g["xs"]), np.asarray(g["ys"])) > 0
        assert geojson_to_geom(None) is None
        assert geojson_to_geom(
            {"type": "Polygon", "coordinates": []}) is None
        with pytest.raises(NotImplementedError):
            geojson_to_geom({"type": "GeometryCollection", "geometries": []})
        with pytest.raises(NotImplementedError):
            geojson_to_geom({"type": "Point", "coordinates": [1, 2, 3]})
        with pytest.raises(ValueError):
            geojson_to_geom({"type": "Banana", "coordinates": [1, 2]})

    def test_three_codecs_agree(self):
        from spandex_spark.sources.wkb import geom_to_wkb, wkb_to_geom
        from spandex_spark.sources.wkt import geom_to_wkt, wkt_to_geom
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2, 10, 12, 12, 10],
                  [0, 0, 4, 4, 1, 2, 2, 1, 0, 0, 2, 2],
                  offs=[0, 4, 8, 12])
        a = wkb_to_geom(geom_to_wkb(g))
        b = wkt_to_geom(geom_to_wkt(g))
        c = geojson_to_geom(geom_to_geojson(g))
        assert a == b == c


class TestSparkAndFile:
    def test_column_codec_roundtrip(self, spark):
        from spandex_spark.sources.grids import donut_zones_df
        src = donut_zones_df(spark)
        back = from_geojson(to_geojson(src, geom_col="geom",
                                       out_col="gj"),
                            json_col="gj", out_col="geom2")
        for r in back.select("geom", "geom2").collect():
            assert list(r.geom.xs) == list(r.geom2.xs)
            assert list(r.geom.ring_offsets) == list(r.geom2.ring_offsets)

    def test_feature_collection_file_roundtrip(self, spark, tmp_path):
        from spandex_spark.sources.grids import donut_zones_df
        src = donut_zones_df(spark)
        p = str(tmp_path / "donut.geojson")
        write_geojson(src, p, geom_col="geom", id_col="dz_id")
        doc = json.load(open(p))
        assert doc["type"] == "FeatureCollection"
        assert len(doc["features"]) == src.count()
        assert doc["features"][0]["geometry"]["type"] in ("Polygon",
                                                          "MultiPolygon")
        back = read_geojson(spark, p)
        a = {r.dz_id: r.geom for r in src.collect()}
        b = {r.dz_id: r.geom for r in back.collect()}
        assert set(a) == set(b)
        for k in a:
            assert list(a[k].xs) == list(b[k].xs)
