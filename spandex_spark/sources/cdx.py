"""Common-Crawl-style CDXJ capture-index interop: SURT keys, reader,
writer — the lookup artifact every CC-derived corpus join starts from.

A CDXJ line is ``<surt-key> <14-digit-ts> <json>`` (the cdx-index /
pywb convention; CC publishes its per-crawl index in exactly this
shape).  The reader is ``spark.read.text`` + one JVM regexp split +
``from_json`` — map-only, splittable per line, no Python.  The writer
is the inverse ``to_json`` + concat.  SURT (Sort-friendly URI
Reordering Transform) keys are built entirely from ``parse_url`` +
array ops, so sorting/joining by key clusters a host's captures —
which is the point: range scans over a host prefix prune the index the
way cell prefixes prune the spatial manifests (``tables.read_bbox``).

Scale notes (the CC index is ~300 GB/crawl): everything is per-line
codegen; joins against page tables go through the surt key, and a
``sortWithinPartitions("surt")`` before write reproduces the
index-file locality the upstream format relies on.

No reference analog (spandex has no web surface, SURVEY.md §1.1);
format per the public pywb/cdxj-indexer documentation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON fields CC's index carries per capture (all strings in the wild).
CDX_FIELDS = ("url", "mime", "status", "digest", "length",
              "offset", "filename")

_JSON_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in CDX_FIELDS])


def surt_key(url: Column) -> Column:
    """SURT form of an http(s) URL: host lowercased, ``www.`` dropped,
    dot-parts reversed and comma-joined, then ``)`` + lowercased
    path[?query].  Documented subset of the full spec: userinfo and
    non-default ports are dropped with the scheme (CC's canonicalizer
    does the same); query-param sorting is out of scope."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    q = F.parse_url(url, F.lit("QUERY"))
    tail = F.when(q.isNull() | (q == ""), path).otherwise(
        F.concat(path, F.lit("?"), q))
    return F.concat(rev, F.lit(")"), F.lower(tail))


def read_cdxj(spark, path: str) -> DataFrame:
    """CDXJ file(s) → (surt, ts timestamp, url, mime, status, digest,
    length long, offset long, filename).  Malformed lines come back
    with NULL surt/ts and the raw line preserved in ``_raw`` — audit,
    don't silently drop."""
    lines = spark.read.text(path)
    surt = F.regexp_extract("value", r"^(\S+) (\d{14}) (\{.*\})$", 1)
    ts = F.regexp_extract("value", r"^(\S+) (\d{14}) (\{.*\})$", 2)
    js = F.regexp_extract("value", r"^(\S+) (\d{14}) (\{.*\})$", 3)
    ok = surt != ""
    parsed = F.from_json(js, _JSON_SCHEMA)
    return (lines
            .select(
                F.when(ok, surt).alias("surt"),
                F.when(ok, F.to_timestamp(ts, "yyyyMMddHHmmss")).alias("ts"),
                *[F.when(ok, parsed[f]).alias(f)
                  for f in ("url", "mime", "status", "digest")],
                F.when(ok, parsed["length"].cast("long")).alias("length"),
                F.when(ok, parsed["offset"].cast("long")).alias("offset"),
                F.when(ok, parsed["filename"]).alias("filename"),
                F.when(~ok, F.col("value")).alias("_raw")))


def to_cdxj_lines(df: DataFrame, *, surt_col: str = "surt",
                  ts_col: str = "ts") -> DataFrame:
    """Inverse of :func:`read_cdxj`: one ``value`` string column per
    capture, fields in the canonical order, NULL JSON fields omitted
    (the format's convention).  Sort by (surt, ts) upstream to emit
    spec-ordered index shards."""
    payload = F.to_json(
        F.struct(*[F.col(f) for f in CDX_FIELDS]),
        {"ignoreNullFields": "true"})
    return df.select(F.concat_ws(
        " ", F.col(surt_col),
        F.date_format(ts_col, "yyyyMMddHHmmss"), payload).alias("value"))


def index_pages(pages: DataFrame, *, url_col: str = "url",
                ts_col: str = "warc_ts") -> DataFrame:
    """Build capture-index rows straight from a pages table: surt key +
    capture timestamp + sha256 content digest of the raw html — the
    in-engine analog of running the cdxj indexer over WARCs."""
    return pages.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        F.sha2(F.col("html").cast("binary"), 256).alias("digest"))
