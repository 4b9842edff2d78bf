"""GeoParquet interop — WKB-in-Parquet with the OGC `geo` footer metadata.

Reference semantics: the reference moves geometry through PostGIS tables;
the modern interchange equivalent its users migrate to is GeoParquet
(OGC GeoParquet 1.0: ordinary Parquet, geometry as a WKB binary column,
one file-level key-value metadata entry ``geo`` describing the primary
geometry column, its encoding, types, and bbox). This module speaks it
both ways on top of sources/wkb.py:

* ``read_geoparquet``: sniffs the ``geo`` footer from one data file
  (driver-side footer read — no data pages), then ``spark.read.parquet``
  + the Arrow-batched WKB decoder on the declared primary column.
  Falls back to a caller-named column when the footer is absent.
* ``write_geoparquet``: serializes the engine geometry struct to WKB and
  writes spec-true files WITH the ``geo`` metadata from each task via
  pyarrow (Spark's own parquet writer cannot attach custom key-value
  footer metadata) — task-unique filenames, one file per partition, so
  the write distributes like any other sink. No commit protocol beyond
  task-unique names (pair with tables.IcebergishTable when atomic
  publish matters — its manifest records whatever files this writes).

Scale shape: the geometry column is (de)serialized where it lives; only
the one-file footer sniff touches the driver.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_KEY = b"geo"


def _geo_metadata(primary: str, geom_types: list[str],
                  bbox: list[float] | None) -> dict:
    col = {"encoding": "WKB", "geometry_types": geom_types}
    if bbox is not None:
        col["bbox"] = bbox
    return {"version": "1.0.0", "primary_column": primary,
            "columns": {primary: col}}


def write_geoparquet(df: DataFrame, path: str, *, geom_col: str = "geom",
                     primary: str = "geometry") -> None:
    """Write ``df`` as GeoParquet: ``geom_col`` (engine struct) becomes a
    WKB column named ``primary``; every data file carries the OGC ``geo``
    footer metadata (geometry types + bbox aggregated per file)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spandex_spark.sources.wkb import geom_to_wkb

    os.makedirs(path, exist_ok=True)
    plain_cols = [c for c in df.columns if c != geom_col]
    src = df.select(*plain_cols, F.col(geom_col).alias("_g"))
    # geometry_types record what the WKB actually says (a holed engine
    # kind-6 with one outer ring serializes as Polygon, not MultiPolygon)
    wkb_names = {1: "Point", 2: "LineString", 3: "Polygon",
                 4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}

    def _write(batches):
        tables = []
        types = set()
        bbox = [np.inf, np.inf, -np.inf, -np.inf]
        n = 0
        for pdf in batches:
            wkb = []
            for i in range(len(pdf)):
                row = {k[3:]: pdf[k].iloc[i] for k in pdf.columns
                       if k.startswith("_g_")}
                if row.get("kind") is None or pd.isna(row.get("kind")):
                    wkb.append(None)
                    continue
                g = {"kind": int(row["kind"]), "xs": row["xs"],
                     "ys": row["ys"], "ring_offsets": row["ring_offsets"]}
                b = geom_to_wkb(g)
                wkb.append(b)
                types.add(wkb_names[int.from_bytes(b[1:5], "little")])
                bb = row.get("bbox")
                if bb is not None:
                    bbox[0] = min(bbox[0], bb["minx"])
                    bbox[1] = min(bbox[1], bb["miny"])
                    bbox[2] = max(bbox[2], bb["maxx"])
                    bbox[3] = max(bbox[3], bb["maxy"])
            arrays = {c: pa.Array.from_pandas(pdf[c])
                      for c in pdf.columns if not c.startswith("_g_")}
            arrays[primary] = pa.array(wkb, type=pa.binary())
            tables.append(pa.table(arrays))
            n += len(pdf)
        if not tables:
            yield pd.DataFrame({"file": pd.Series([], dtype=object),
                                "rows": pd.Series([], dtype="int64")})
            return
        meta = _geo_metadata(
            primary, sorted(types),
            None if bbox[0] == np.inf else [float(v) for v in bbox])
        t = pa.concat_tables(tables).replace_schema_metadata(
            {GEO_KEY: json.dumps(meta).encode()})
        out_path = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, out_path)
        yield pd.DataFrame({"file": [out_path], "rows": [n]})

    flat = src.select(*plain_cols,
                      F.col("_g")["kind"].alias("_g_kind"),
                      F.col("_g")["xs"].alias("_g_xs"),
                      F.col("_g")["ys"].alias("_g_ys"),
                      F.col("_g")["ring_offsets"].alias("_g_ring_offsets"),
                      F.col("_g")["bbox"].alias("_g_bbox"))
    written = flat.mapInPandas(_write, schema="file string, rows long")
    written.collect()  # collect-ok: one row per partition (file manifest)


def read_geoparquet(spark: SparkSession, path: str, *,
                    geom_col: str | None = None,
                    out_col: str = "geom") -> DataFrame:
    """Read GeoParquet into a DataFrame with the engine geometry struct in
    ``out_col``. The primary geometry column comes from the ``geo``
    footer; pass ``geom_col`` to override (or when the footer is absent,
    e.g. plain parquet holding WKB)."""
    import pyarrow.parquet as pq
    from spandex_spark.sources.wkb import from_wkb

    primary = geom_col
    if primary is None:
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet"))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        md = pq.read_schema(os.path.join(path, files[0])).metadata or {}
        if GEO_KEY not in md:
            raise ValueError(
                f"{path} carries no 'geo' footer metadata; pass geom_col=")
        primary = json.loads(md[GEO_KEY])["primary_column"]
    raw = spark.read.parquet(path)
    return from_wkb(raw, wkb_col=primary, out_col=out_col).drop(primary)
