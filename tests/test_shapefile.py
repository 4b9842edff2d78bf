"""O9 shapefile load: pure-numpy reader/writer vs the public ESRI spec.

Round-trips alone could hide a compensating writer/reader bug, so the
writer's bytes are ALSO asserted against spec constants (magic, version,
shape-type codes, ring closure + clockwise outer orientation), and the
loaded layers must behave identically to the parquet fixtures inside a
real operator (tag_points)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from spandex_spark.sources.shapefile import read_shapefile, write_shapefile


def _rows(df, id_col, n=None):
    rows = [(r[0], r[1].asDict(recursive=True) if r[1] is not None else None)
            for r in df.select(id_col, "geom").collect()]
    return sorted(rows)[:n] if n else sorted(rows)


def _geom_key(g):
    if g is None:
        return None
    return (g["kind"], tuple(np.round(g["xs"], 12)),
            tuple(np.round(g["ys"], 12)), tuple(g["ring_offsets"] or ()))


class TestShapefileRoundTrip:
    @pytest.mark.parametrize("layer,id_col", [
        ("zones", "zone_id"), ("donut", "dz_id"),
        ("multipart", "mz_id"), ("roads", "road_id")])
    def test_layer_round_trip(self, spark, tmp_path, layer, id_col):
        from spandex_spark.sources import grids
        df = {"zones": grids.zones_df, "donut": grids.donut_zones_df,
              "multipart": grids.multipart_zones_df,
              "roads": grids.roads_df}[layer](spark)
        rows = _rows(df, id_col)
        path = str(tmp_path / layer)
        write_shapefile(path, rows)
        back = _rows(read_shapefile(spark, path), "id")
        assert [i for i, _ in back] == [i for i, _ in rows]
        for (_, a), (_, b) in zip(rows, back):
            ka, kb = _geom_key(a), _geom_key(b)
            # kind may normalize 6->3 for single-ring; compare rings/coords
            assert ka[1:] == kb[1:], (ka, kb)

    def test_bytes_match_spec(self, spark, tmp_path):
        from spandex_spark.sources.grids import donut_zones_df
        rows = _rows(donut_zones_df(spark), "dz_id")
        path = str(tmp_path / "spec")
        write_shapefile(path, rows)
        buf = open(path + ".shp", "rb").read()
        assert struct.unpack(">i", buf[:4])[0] == 9994       # magic
        assert struct.unpack(">i", buf[24:28])[0] * 2 == len(buf)
        assert struct.unpack("<i", buf[28:32])[0] == 1000    # version
        assert struct.unpack("<i", buf[32:36])[0] == 5       # Polygon
        # first record: 2 rings, closed, OUTER CLOCKWISE per spec
        stype, = struct.unpack("<i", buf[108:112])
        assert stype == 5
        nparts, npts = struct.unpack("<ii", buf[144:152])
        assert nparts == 2 and npts == 10                    # 4+1 + 4+1
        starts = np.frombuffer(buf, "<i4", nparts, 152)
        pts = np.frombuffer(buf, "<f8", 2 * npts, 152 + 8).reshape(-1, 2)
        ring0 = pts[starts[0]:starts[1]]
        assert (ring0[0] == ring0[-1]).all()                 # closed
        xs, ys = ring0[:-1, 0], ring0[:-1, 1]
        area = 0.5 * np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
        assert area < 0                                      # clockwise
        # shx: 100-byte header + 8 bytes per record
        shx = open(path + ".shx", "rb").read()
        assert (len(shx) - 100) // 8 == len(rows)

    def test_points_and_operator_equivalence(self, spark, tmp_path):
        from spandex_spark.sources.grids import donut_zones_df, derived_points
        from spandex_spark.operators import tag_points
        # points round-trip
        prows = [(i, {"kind": 1, "xs": [float(i)], "ys": [float(-i)],
                      "ring_offsets": [0, 1],
                      "bbox": {"minx": float(i), "miny": float(-i),
                               "maxx": float(i), "maxy": float(-i)}})
                 for i in range(5)]
        write_shapefile(str(tmp_path / "pts"), prows)
        back = _rows(read_shapefile(spark, str(tmp_path / "pts")), "id")
        assert [(i, g["xs"], g["ys"]) for i, g in back] == \
               [(i, g["xs"], g["ys"]) for i, g in prows]
        # a shapefile-loaded polygon layer must tag identically to the
        # generated layer (holes included)
        dz = donut_zones_df(spark)
        write_shapefile(str(tmp_path / "dz"), _rows(dz, "dz_id"))
        loaded = read_shapefile(spark, str(tmp_path / "dz")) \
            .withColumnRenamed("id", "dz_id")
        pts = derived_points(
            spark.range(3000).select(F.col("id").alias("p")), "p")
        a = {(r.p, r.dz_id) for r in
             tag_points(pts, dz, poly_id_col="dz_id", point_id_col="p",
                        level=7).collect()}
        b = {(r.p, r.dz_id) for r in
             tag_points(pts, loaded, poly_id_col="dz_id", point_id_col="p",
                        level=7).collect()}
        assert a == b
