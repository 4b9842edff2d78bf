"""(E)WKB interop: golden spec vectors, round trips, orientation
normalization, and the Spark-level column codec (sources/wkb.py)."""

import numpy as np
import pytest

from spandex_spark.sources.wkb import (geom_to_wkb, wkb_to_geom,
                                       from_wkb, to_wkb)


def _poly(xs, ys, offs=None):
    xs = list(map(float, xs)); ys = list(map(float, ys))
    return {"kind": 3 if offs is None or len(offs) <= 2 else 6,
            "xs": xs, "ys": ys,
            "ring_offsets": offs or [0, len(xs)],
            "bbox": {"minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)}}


class TestGoldenVectors:
    def test_point_ndr(self):
        g = {"kind": 1, "xs": [1.0], "ys": [2.0], "ring_offsets": [0, 1],
             "bbox": {"minx": 1.0, "miny": 2.0, "maxx": 1.0, "maxy": 2.0}}
        assert geom_to_wkb(g).hex() == (
            "0101000000000000000000f03f0000000000000040")

    def test_point_xdr(self):
        g = {"kind": 1, "xs": [1.0], "ys": [2.0], "ring_offsets": [0, 1],
             "bbox": {"minx": 1.0, "miny": 2.0, "maxx": 1.0, "maxy": 2.0}}
        assert geom_to_wkb(g, byte_order="big").hex() == (
            "00000000013ff00000000000004000000000000000")

    def test_point_parse_both_orders(self):
        for h in ("0101000000000000000000f03f0000000000000040",
                  "00000000013ff00000000000004000000000000000"):
            g = wkb_to_geom(bytes.fromhex(h))
            assert g["kind"] == 1 and g["xs"] == [1.0] and g["ys"] == [2.0]

    def test_ewkb_srid_point(self):
        """PostGIS geometry(Point,4326): flag 0x20000000, srid uint32."""
        g = {"kind": 1, "xs": [1.0], "ys": [2.0], "ring_offsets": [0, 1],
             "bbox": {"minx": 1.0, "miny": 2.0, "maxx": 1.0, "maxy": 2.0}}
        b = geom_to_wkb(g, srid=4326)
        assert b.hex().startswith("0101000020e6100000")
        parsed = wkb_to_geom(b)
        assert parsed["xs"] == [1.0] and parsed["ys"] == [2.0]

    def test_linestring_golden(self):
        g = {"kind": 2, "xs": [0.0, 1.0, 2.0], "ys": [0.0, 1.0, 0.0],
             "ring_offsets": [0, 3],
             "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 2.0, "maxy": 1.0}}
        want = ("010200000003000000"
                "00000000000000000000000000000000"
                "000000000000f03f000000000000f03f"
                "00000000000000400000000000000000")
        assert geom_to_wkb(g).hex() == want
        back = wkb_to_geom(bytes.fromhex(want))
        assert back["kind"] == 2 and back["xs"] == [0.0, 1.0, 2.0]

    def test_polygon_closes_rings(self):
        g = _poly([0, 4, 4, 0], [0, 0, 4, 4])
        b = geom_to_wkb(g)
        # type 3, 1 ring, 5 points (closed)
        assert b.hex().startswith("0103000000" "01000000" "05000000")
        back = wkb_to_geom(b)
        assert back["kind"] == 3
        assert back["xs"] == [0.0, 4.0, 4.0, 0.0]  # reopened

    def test_point_empty_nan_is_null(self):
        h = "0101000000" + "000000000000f87f" * 2  # NaN NaN
        assert wkb_to_geom(bytes.fromhex(h)) is None

    def test_z_dimension_raises(self):
        with pytest.raises(NotImplementedError):
            wkb_to_geom(bytes.fromhex(
                "01e9030000" + "0000000000000000" * 3))  # ISO 1001 PointZ
        with pytest.raises(NotImplementedError):
            wkb_to_geom(bytes.fromhex(
                "0101000080" + "0000000000000000" * 3))  # EWKB Z flag

    def test_geometrycollection_raises(self):
        with pytest.raises(NotImplementedError):
            wkb_to_geom(bytes.fromhex("010700000000000000"))


class TestRoundTrips:
    def test_polygon_with_hole(self):
        g = _poly([0, 4, 4, 0, 1, 1, 2, 2], [0, 0, 4, 4, 1, 2, 2, 1],
                  offs=[0, 4, 8])
        for bo in ("little", "big"):
            back = wkb_to_geom(geom_to_wkb(g, byte_order=bo))
            assert back["kind"] == 6
            assert back["ring_offsets"] == [0, 4, 8]
            assert back["xs"] == g["xs"] and back["ys"] == g["ys"]

    def test_multipolygon_two_parts_with_hole(self):
        # part A: outer + hole; part B: plain square — grouping must
        # rebuild [A(outer,hole)],[B] and the flat list must round-trip
        xs = [0, 4, 4, 0, 1, 1, 2, 2, 10, 12, 12, 10]
        ys = [0, 0, 4, 4, 1, 2, 2, 1, 0, 0, 2, 2]
        g = _poly(xs, ys, offs=[0, 4, 8, 12])
        b = geom_to_wkb(g)
        assert b[1:5] == (6).to_bytes(4, "little")  # MultiPolygon
        back = wkb_to_geom(b)
        assert back["ring_offsets"] == [0, 4, 8, 12]
        assert back["xs"] == g["xs"] and back["ys"] == g["ys"]

    def test_multilinestring(self):
        g = {"kind": 2, "xs": [0.0, 1.0, 5.0, 6.0, 7.0],
             "ys": [0.0, 1.0, 5.0, 5.0, 6.0], "ring_offsets": [0, 2, 5],
             "bbox": {"minx": 0.0, "miny": 0.0, "maxx": 7.0, "maxy": 6.0}}
        back = wkb_to_geom(geom_to_wkb(g))
        assert back["kind"] == 2 and back["ring_offsets"] == [0, 2, 5]
        assert back["xs"] == g["xs"]

    def test_multipoint(self):
        g = {"kind": 1, "xs": [0.0, 3.0], "ys": [1.0, 4.0],
             "ring_offsets": [0, 2],
             "bbox": {"minx": 0.0, "miny": 1.0, "maxx": 3.0, "maxy": 4.0}}
        back = wkb_to_geom(geom_to_wkb(g))
        assert back["kind"] == 1 and back["xs"] == [0.0, 3.0]

    def test_orientation_renormalized(self):
        """PostGIS doesn't enforce WKB ring orientation: a CW exterior /
        CCW hole input must come back in engine convention (outer CCW,
        hole CW) with identical area semantics."""
        import struct
        body = struct.pack("<BII", 1, 3, 2)
        outer = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]          # CW
        hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]           # CCW
        for ring in (outer, hole):
            body += struct.pack("<I", len(ring))
            for x, y in ring:
                body += struct.pack("<dd", float(x), float(y))
        g = wkb_to_geom(body)
        from spandex_spark.geom import shoelace_area
        xs, ys = np.asarray(g["xs"]), np.asarray(g["ys"])
        offs = g["ring_offsets"]
        assert shoelace_area(xs[offs[0]:offs[1]], ys[offs[0]:offs[1]]) > 0
        assert shoelace_area(xs[offs[1]:offs[2]], ys[offs[1]:offs[2]]) < 0

    def test_null_passthrough(self):
        assert geom_to_wkb(None) is None
        assert wkb_to_geom(None) is None


class TestSparkCodec:
    def test_donut_layer_roundtrip(self, spark):
        """The donut-zone layer serialized to EWKB and parsed back must be
        structurally identical (the pip_tag_wkb driver query then proves
        behavioral identity under tag_points)."""
        from spandex_spark.sources.grids import donut_zones_df
        src = donut_zones_df(spark)
        back = from_wkb(to_wkb(src, srid=4326, geom_col="geom",
                               out_col="wkb"),
                        wkb_col="wkb", out_col="geom2")
        rows = back.select("dz_id", "geom", "geom2").collect()
        assert len(rows) > 0
        for r in rows:
            a, b = r.geom, r.geom2
            assert list(a.xs) == list(b.xs)
            assert list(a.ys) == list(b.ys)
            assert list(a.ring_offsets) == list(b.ring_offsets)
            assert b.kind in (3, 6)
