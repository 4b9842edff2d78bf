"""GPX (GPS Exchange Format 1.1, Topografix — the ubiquitous consumer
GPS-track XML) → trackpoint rows, pure JVM.

The format is regular enough that a streaming regexp extraction is the
honest parser for the trackpoint layer (the same judgement call as
`operators/robots.py` for robots.txt and `linkgraph.extract_links` for
href): every trackpoint is one ``<trkpt lat=".." lon="..">`` element
with optional ``<ele>`` / ``<time>`` children, and namespaces/extension
blobs never nest another trkpt inside one.  A full XML parse would buy
nothing and cost a per-row Python pass.

Output schema matches what `operators/trajectory.py` (trip_stats,
stay_points, od_matrix, make_line) and `operators/mapmatch.py` consume:
(track_id, seg, seq, lon, lat, ele, ts) — track_id from the caller's
id column, seg the 0-based ``<trkseg>`` index, seq the 0-based point
index within the segment.

Scale shape: map-only (one regexp_extract_all for segments, one nested
for trkpts, two posexplodes); a 10^9-file crawl of GPX attachments
parses with zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_gpx"]

_SEG_RE = r"(?is)<trkseg[^>]*>(.*?)</trkseg>"
_PT_RE = r"(?is)(<trkpt[^>]*>.*?</trkpt>|<trkpt[^>]*/>)"


def parse_gpx(df: DataFrame, *, gpx_col: str = "gpx",
              id_col: str = "track_id") -> DataFrame:
    """(id_col, seg, seq, lon, lat, ele, ts) per trackpoint.  ``ele``
    is NULL when absent; ``ts`` is the parsed ``<time>`` (ISO-8601,
    'Z'-suffixed per the spec) as a timestamp, NULL when absent.
    Rows whose gpx column is NULL or contains no track emit nothing.
    Binary columns decode as UTF-8 (the extract_links convention)."""
    g = F.col(gpx_col)
    xml = F.when(g.isNotNull(), g.cast("string"))
    segs = F.regexp_extract_all(xml, F.lit(_SEG_RE), 1)
    seg_rows = (df.select(F.col(id_col), F.posexplode(segs)
                          .alias("seg", "_seg_xml")))
    pts = F.regexp_extract_all(F.col("_seg_xml"), F.lit(_PT_RE), 1)
    pt_rows = (seg_rows.select(id_col, "seg",
                               F.posexplode(pts).alias("seq", "_pt")))
    p = F.col("_pt")
    lat = F.regexp_extract(p, r'(?is)lat\s*=\s*["\']([-0-9.eE+]+)', 1)
    lon = F.regexp_extract(p, r'(?is)lon\s*=\s*["\']([-0-9.eE+]+)', 1)
    ele = F.regexp_extract(p, r"(?is)<ele[^>]*>([^<]*)</ele>", 1)
    ts = F.regexp_extract(p, r"(?is)<time[^>]*>([^<]*)</time>", 1)
    return (pt_rows.select(
        id_col, "seg", "seq",
        lon.cast("double").alias("lon"),
        lat.cast("double").alias("lat"),
        F.when(ele != "", ele.cast("double")).alias("ele"),
        F.when(ts != "", F.to_timestamp(ts)).alias("ts"))
        .where(F.col("lon").isNotNull() & F.col("lat").isNotNull()))
