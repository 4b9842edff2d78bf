"""WKT interop: golden text vectors, round trips via the shared WKB ring
machinery, and the Spark-level column codec (sources/wkt.py)."""

import numpy as np
import pytest

from spandex_spark.sources.wkt import (from_wkt, geom_to_wkt, to_wkt,
                                       wkt_to_geom)


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
        assert geom_to_wkt(g) == "POINT (1 2.5)"
        back = wkt_to_geom("POINT (1 2.5)")
        assert back["xs"] == [1.0] and back["ys"] == [2.5]

    def test_ewkt_srid(self):
        g = {"kind": 1, "xs": [1.0], "ys": [2.0], "ring_offsets": [0, 1],
             "bbox": {"minx": 1.0, "miny": 2.0, "maxx": 1.0, "maxy": 2.0}}
        t = geom_to_wkt(g, srid=4326)
        assert t == "SRID=4326;POINT (1 2)"
        assert wkt_to_geom(t)["xs"] == [1.0]

    def test_polygon_closed_and_reopened(self):
        g = _poly([0, 4, 4, 0], [0, 0, 4, 4])
        t = geom_to_wkt(g)
        assert t == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        back = wkt_to_geom(t)
        assert back["kind"] == 3 and back["xs"] == [0.0, 4.0, 4.0, 0.0]

    def test_polygon_with_hole(self):
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2], [0, 0, 4, 4, 1, 2, 2, 1],
                  offs=[0, 4, 8])
        t = geom_to_wkt(g)
        assert t.startswith("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1,")
        back = wkt_to_geom(t)
        assert back["ring_offsets"] == [0, 4, 8]
        assert back["xs"] == g["xs"] and back["ys"] == g["ys"]

    def test_multipolygon(self):
        xs = [0, 4, 4, 0, 1, 1, 2, 2, 10, 12, 12, 10]
        ys = [0, 0, 4, 4, 1, 2, 2, 1, 0, 0, 2, 2]
        g = _poly(xs, ys, offs=[0, 4, 8, 12])
        t = geom_to_wkt(g)
        assert t.startswith("MULTIPOLYGON (((")
        back = wkt_to_geom(t)
        assert back["ring_offsets"] == [0, 4, 8, 12]
        assert back["xs"] == g["xs"]

    def test_linestring_and_multi(self):
        g = {"kind": 2, "xs": [0.0, 1.0, 2.0], "ys": [0.0, 1.0, 0.0],
             "ring_offsets": [0, 3],
             "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 2.0, "maxy": 1.0}}
        assert geom_to_wkt(g) == "LINESTRING (0 0, 1 1, 2 0)"
        g2 = dict(g, ring_offsets=[0, 2, 3])
        t2 = geom_to_wkt(g2)
        assert t2 == "MULTILINESTRING ((0 0, 1 1), (2 0))"
        back = wkt_to_geom(t2)
        assert back["ring_offsets"] == [0, 2, 3]

    def test_multipoint_both_nestings(self):
        for t in ("MULTIPOINT (0 1, 3 4)", "MULTIPOINT ((0 1), (3 4))"):
            g = wkt_to_geom(t)
            assert g["kind"] == 1 and g["xs"] == [0.0, 3.0]

    def test_empty_and_errors(self):
        assert wkt_to_geom("POINT EMPTY") is None
        assert wkt_to_geom("POLYGON EMPTY") is None
        assert wkt_to_geom(None) is None
        assert geom_to_wkt(None) is None
        with pytest.raises(NotImplementedError):
            wkt_to_geom("POINT Z (1 2 3)")
        with pytest.raises(NotImplementedError):
            wkt_to_geom("GEOMETRYCOLLECTION (POINT (1 2))")
        with pytest.raises(ValueError):
            wkt_to_geom("BANANA (1 2)")

    def test_orientation_renormalized(self):
        """CW exterior / CCW hole text input comes back engine-oriented."""
        t = "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
        g = wkt_to_geom(t)
        from spandex_spark.geom import shoelace_area
        xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
        offs = g["ring_offsets"]
        assert shoelace_area(xs[offs[0]:offs[1]], ys[offs[0]:offs[1]]) > 0
        assert shoelace_area(xs[offs[1]:offs[2]], ys[offs[1]:offs[2]]) < 0

    def test_scientific_and_negative_numbers(self):
        g = wkt_to_geom("LINESTRING (-1.5e2 .25, +3 -4.75)")
        assert g["xs"] == [-150.0, 3.0] and g["ys"] == [0.25, -4.75]


class TestWkbWktAgree:
    def test_same_struct_both_codecs(self):
        """WKT and WKB round-trips share ring helpers — identical output
        structs for identical input."""
        from spandex_spark.sources.wkb import geom_to_wkb, wkb_to_geom
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2, 10, 12, 12, 10],
                  [0, 0, 4, 4, 1, 2, 2, 1, 0, 0, 2, 2],
                  offs=[0, 4, 8, 12])
        a = wkt_to_geom(geom_to_wkt(g))
        b = wkb_to_geom(geom_to_wkb(g))
        assert a == b


class TestSparkCodec:
    def test_donut_layer_roundtrip(self, spark):
        from spandex_spark.sources.grids import donut_zones_df
        src = donut_zones_df(spark)
        back = from_wkt(to_wkt(src, geom_col="geom", out_col="wkt",
                               srid=4326),
                        wkt_col="wkt", out_col="geom2")
        rows = back.select("dz_id", "geom", "geom2").collect()
        assert len(rows) > 0
        for r in rows:
            assert list(r.geom.xs) == list(r.geom2.xs)
            assert list(r.geom.ys) == list(r.geom2.ys)
            assert list(r.geom.ring_offsets) == list(r.geom2.ring_offsets)
