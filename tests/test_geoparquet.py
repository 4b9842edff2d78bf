"""GeoParquet interop: spec `geo` footer metadata, distributed WKB
write/read, and the struct round-trip (sources/geoparquet.py)."""

import json
import os

import numpy as np
import pytest

from spandex_spark.sources.geoparquet import (GEO_KEY, read_geoparquet,
                                              write_geoparquet)


class TestGeoParquet:
    def test_roundtrip_and_footer(self, spark, tmp_path):
        from spandex_spark.sources.grids import donut_zones_df
        import pyarrow.parquet as pq
        src = donut_zones_df(spark)
        out = str(tmp_path / "gp")
        write_geoparquet(src, out, geom_col="geom")
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        md = pq.read_schema(os.path.join(out, files[0])).metadata
        geo = json.loads(md[GEO_KEY])
        assert geo["primary_column"] == "geometry"
        assert geo["columns"]["geometry"]["encoding"] == "WKB"
        assert "Polygon" in geo["columns"]["geometry"]["geometry_types"]
        bb = geo["columns"]["geometry"]["bbox"]
        assert bb[0] <= bb[2] and bb[1] <= bb[3]

        back = read_geoparquet(spark, out)
        a = {r.dz_id: r.geom for r in src.collect()}
        b = {r.dz_id: r.geom for r in back.collect()}
        assert set(a) == set(b)
        for k in a:
            assert list(a[k].xs) == list(b[k].xs)
            assert list(a[k].ring_offsets) == list(b[k].ring_offsets)

    def test_read_override_and_missing_footer(self, spark, tmp_path):
        """Plain parquet holding WKB (no footer): geom_col= override
        works, footer sniff raises a clear error."""
        from pyspark.sql import functions as F
        from spandex_spark.sources.wkb import to_wkb
        from spandex_spark.sources.grids import donut_zones_df
        plain = str(tmp_path / "plain")
        (to_wkb(donut_zones_df(spark), geom_col="geom", out_col="wkbcol")
         .select("dz_id", "wkbcol").write.parquet(plain))
        with pytest.raises(ValueError):
            read_geoparquet(spark, plain)
        back = read_geoparquet(spark, plain, geom_col="wkbcol")
        assert back.filter(F.col("geom").isNotNull()).count() == \
            donut_zones_df(spark).count()

    def test_empty_partitions_ok(self, spark, tmp_path):
        """Partitions with no rows write no file and break nothing."""
        from spandex_spark.sources.grids import donut_zones_df
        src = donut_zones_df(spark).repartition(64)
        out = str(tmp_path / "gp_sparse")
        write_geoparquet(src, out)
        back = read_geoparquet(spark, out)
        assert back.count() == donut_zones_df(spark).count()
