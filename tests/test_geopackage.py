"""GeoPackage interop (sources/geopackage.py): spec-level container
checks + exact geometry round-trip through the engine WKB codec."""

import os
import sqlite3

import pytest

from spandex_spark.sources.geopackage import (read_geopackage,
                                              write_geopackage)

GEOM_SCHEMA = ("pid long, name string, geom struct<kind:tinyint,"
               " xs:array<double>, ys:array<double>,"
               " ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")


def _poly(pid, name, xs, ys, offsets=None):
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    offsets = offsets or [0, len(xs)]
    return (pid, name, {"kind": 3, "xs": xs, "ys": ys,
                        "ring_offsets": [int(v) for v in offsets],
                        "bbox": {"minx": min(xs), "miny": min(ys),
                                 "maxx": max(xs), "maxy": max(ys)}})


def _sample(spark):
    rows = [
        _poly(1, "square", [0, 2, 2, 0, 0], [0, 0, 2, 2, 0]),
        # donut: outer CCW + CW hole
        _poly(2, "donut", [0, 4, 4, 0, 0, 1, 1, 3, 3, 1],
              [0, 0, 4, 4, 0, 1, 3, 3, 1, 1], [0, 5, 10]),
        (3, "nogeom", None),
    ]
    return spark.createDataFrame(rows, GEOM_SCHEMA)


def test_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "layer.gpkg")
    write_geopackage(_sample(spark), p)
    back = {r["pid"]: r for r in read_geopackage(spark, p).collect()}
    src = {r["pid"]: r for r in _sample(spark).collect()}
    assert set(back) == {1, 2, 3}
    for pid in (1, 2):
        a, b = src[pid]["geom"], back[pid]["geom"]
        assert list(a["xs"]) == list(b["xs"])
        assert list(a["ys"]) == list(b["ys"])
        assert list(a["ring_offsets"]) == list(b["ring_offsets"])
        assert back[pid]["name"] == src[pid]["name"]
    assert back[3]["geom"] is None


def test_container_is_spec_conformant_sqlite(spark, tmp_path):
    p = str(tmp_path / "spec.gpkg")
    write_geopackage(_sample(spark), p, table="parcels")
    con = sqlite3.connect(p)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"gpkg_spatial_ref_sys", "gpkg_contents",
            "gpkg_geometry_columns", "parcels"} <= tables
    (tn, dt, sid) = con.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents"
    ).fetchone()
    assert (tn, dt, sid) == ("parcels", "features", 4326)
    # layer bbox covers both polygons
    (mnx, mny, mxx, mxy) = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
    assert (mnx, mny, mxx, mxy) == (0.0, 0.0, 4.0, 4.0)
    # geometry blob starts with the GP magic
    blob = con.execute("SELECT geom FROM parcels WHERE fid=1").fetchone()[0]
    assert bytes(blob[:2]) == b"GP"
    con.close()


def test_read_requires_table_when_ambiguous(spark, tmp_path):
    p = str(tmp_path / "two.gpkg")
    write_geopackage(_sample(spark), p, table="a")
    # add a second registered layer by hand
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE b (fid INTEGER PRIMARY KEY, geom BLOB)")
    con.execute("INSERT INTO b (geom) SELECT geom FROM a LIMIT 1")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES"
                " ('b','geom','GEOMETRY',4326,0,0)")
    con.commit(); con.close()
    with pytest.raises(ValueError, match="need table="):
        read_geopackage(spark, p)
    assert read_geopackage(spark, p, table="b").count() == 1


def test_not_a_geopackage_rejected(spark, tmp_path):
    p = str(tmp_path / "plain.db")
    con = sqlite3.connect(p); con.execute("CREATE TABLE t (x)"); con.close()
    with pytest.raises(ValueError, match="not a GeoPackage"):
        read_geopackage(spark, p)


def test_pip_parity_through_gpkg(spark, tmp_path, fixture_dir):
    """Zones written to gpkg and read back tag points identically to the
    parquet zones — the shared-oracle pattern of pip_tag_shapefile."""
    from pyspark.sql import functions as F

    from spandex_spark.operators.tag import tag_points
    zones = spark.read.parquet(os.path.join(fixture_dir, "zones.parquet"))
    pts = spark.read.parquet(os.path.join(fixture_dir, "poi.parquet"))
    p = str(tmp_path / "zones.gpkg")
    write_geopackage(zones, p, table="zones")
    zones2 = read_geopackage(spark, p).select(zones.columns)
    a = tag_points(pts, zones, poly_id_col="zone_id",
                   point_id_col="poi_id", level=9)
    b = tag_points(pts, zones2, poly_id_col="zone_id",
                   point_id_col="poi_id", level=9)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_null_in_first_row_types_from_later_rows(spark, tmp_path):
    """A NULL attribute on feature 0 must not mistype the column
    (review finding: first-row inference crashed the read and
    stringified the write)."""
    rows = [(1, None, None, _poly(1, "x", [0, 1, 1, 0], [0, 0, 1, 1])[2]),
            (2, 42, 2.5, _poly(2, "y", [2, 3, 3, 2], [0, 0, 1, 1])[2])]
    df = spark.createDataFrame(
        rows, "pid long, pop long, score double, geom struct<kind:tinyint,"
              " xs:array<double>, ys:array<double>, ring_offsets:array<int>,"
              " bbox:struct<minx:double,miny:double,maxx:double,maxy:double>>")
    p = str(tmp_path / "nulls.gpkg")
    write_geopackage(df, p)
    back = {r["pid"]: r for r in read_geopackage(spark, p).collect()}
    assert back[1]["pop"] is None and back[2]["pop"] == 42
    assert back[2]["score"] == 2.5
    # sqlite declared the column numeric, not TEXT
    import sqlite3 as _sq
    con = _sq.connect(p)
    decl = {r[1]: r[2] for r in con.execute("PRAGMA table_info(features)")}
    con.close()
    assert decl["pop"] == "INTEGER" and decl["score"] == "REAL"
