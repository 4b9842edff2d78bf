"""WARC (ISO 28500 / WARC 1.0-1.1) crawl-archive interop.

WARC is *the* wire format of web crawls — Common Crawl ships its
corpus as ~1 GB ``.warc.gz`` files with one gzip member per record —
and the graft's canonical input (BASELINE input_hint; FIXTURES.md §1)
is exactly the pages table such an archive yields. spandex itself
never reads crawls (it loads PostGIS — SURVEY.md §1.1), but an engine
whose north star is "geotag extracted crawl text" needs the crawl
format at its front door, on par with `operators/html.extract_text`.

Pure stdlib (`gzip`/`zlib`); no warcio dependency.

Scale shape (the 100 TB contract):

* **one WARC file = one task.** `read_warc` turns a path list into a
  single-column DataFrame repartitioned to one file per partition and
  parses inside `mapInPandas`.  Common Crawl's 100 TB ≈ 10^5 gz files
  → 10^5 independent tasks; there is no finer split worth having
  because gzip members must be read sequentially anyway.
* **streamed, bounded memory.** The parser never materialises a
  decompressed file: it walks records off a buffered stream and yields
  Arrow batches of ``batch_rows`` records, so a 1 GB archive flows
  through a task at O(batch) memory.
* **driver-side writer.** `write_warc` is an edge-format export (same
  contract as write_geojson / write_geopackage): bounded page sets
  out, one gzip member per record so downstream readers can split and
  random-access members — the Common Crawl convention.

Record mapping: ``response`` records carry an ``application/http``
payload; the reader unwraps the HTTP envelope into ``http_status`` +
``content_type`` (from the HTTP headers) and ``payload`` = the body
bytes. Other record types (``warcinfo``, ``resource``, ``request``,
``metadata``) pass their raw block through with the WARC-level
Content-Type. `read_warc_pages` is the glue that filters html
responses into the canonical ``(url, warc_ts, html)`` shape
`pipeline.ingest_pages` consumes.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
import os
from datetime import datetime
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = ("url string, warc_ts timestamp, record_type string, "
           "content_type string, http_status int, payload binary, "
           "warc_file string, record_seq long")

_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


# ------------------------------------------------------------------ parse

def _read_headers(fp) -> tuple[str, dict[str, str]] | None:
    """Read one WARC header block: version line + headers up to the
    blank line. Returns None at clean EOF. Tolerates CRLF and bare LF,
    and skips inter-record padding newlines."""
    line = fp.readline()
    while line in (b"\r\n", b"\n"):
        line = fp.readline()
    if not line:
        return None
    version = line.strip().decode("ascii", "replace")
    if not version.startswith("WARC/"):
        raise ValueError(f"expected WARC version line, got {version!r}")
    headers: dict[str, str] = {}
    last = None
    while True:
        line = fp.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        k, _, v = line.decode("utf-8", "replace").partition(":")
        last = k.strip().lower()
        headers[last] = v.strip()
    return version, headers


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP message → (status, Content-Type, body). Malformed blocks
    come back as (None, None, block) — crawl data is dirty."""
    sep = block.find(b"\r\n\r\n")
    nl = b"\r\n"
    if sep < 0:
        sep = block.find(b"\n\n")
        nl = b"\n"
        if sep < 0:
            return None, None, block
    head = block[:sep].decode("latin-1", "replace")
    body = block[sep + 2 * len(nl):]
    lines = head.split(nl.decode())
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0].startswith("HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body


def _iter_records(fp, warc_file: str) -> Iterator[dict]:
    seq = 0
    while True:
        head = _read_headers(fp)
        if head is None:
            return
        _, h = head
        length = int(h.get("content-length", "0"))
        block = fp.read(length)
        if len(block) != length:
            raise ValueError(
                f"truncated WARC record in {warc_file} at seq {seq}")
        rtype = h.get("warc-type", "unknown")
        ctype = h.get("content-type")
        status = None
        payload = block
        if ctype and ctype.split(";")[0].strip() == "application/http":
            status, http_ctype, payload = _split_http(block)
            if http_ctype is not None:
                ctype = http_ctype
        ts = None
        date = h.get("warc-date")
        if date:
            try:
                ts = datetime.strptime(date[:19] + "Z", _DATE_FMT)
            except ValueError:
                ts = None
        yield {"url": h.get("warc-target-uri"), "warc_ts": ts,
               "record_type": rtype, "content_type": ctype,
               "http_status": status, "payload": payload,
               "warc_file": warc_file, "record_seq": seq}
        seq += 1


def _open_warc(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        # gzip.open reads concatenated members transparently — exactly
        # the member-per-record CC layout
        return gzip.open(path, "rb")
    return io.BufferedReader(open(path, "rb"))


# ------------------------------------------------------------------ read

def read_warc(spark: SparkSession, paths: str | list[str], *,
              batch_rows: int = 256) -> DataFrame:
    """Distributed WARC read: one file per task, streamed records out.

    ``paths``: a glob, a single path, or an explicit list. Output one
    row per WARC record (schema above); ``payload`` is the HTTP body
    for response records, the raw block otherwise.
    """
    if isinstance(paths, str):
        hits = sorted(_glob.glob(paths)) if any(
            c in paths for c in "*?[") else [paths]
    else:
        hits = list(paths)
    if not hits:
        raise ValueError(f"no WARC files match {paths!r}")
    for p in hits:
        if not os.path.exists(p):
            raise ValueError(f"no such WARC file: {p}")

    # round-robin repartition (NO column): exactly one file per
    # partition — hash partitioning on the path would birthday-collide
    # into 2-3-file straggler tasks and empty partitions
    files = spark.createDataFrame([(p,) for p in hits], "path string") \
                 .repartition(len(hits))

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            for path in pdf["path"]:
                fp = _open_warc(path)
                try:
                    buf = []
                    for rec in _iter_records(fp, os.path.basename(path)):
                        buf.append(rec)
                        if len(buf) >= batch_rows:
                            yield pd.DataFrame(buf)
                            buf = []
                    if buf:
                        yield pd.DataFrame(buf)
                finally:
                    fp.close()

    return files.mapInPandas(parse, _SCHEMA)


def read_warc_pages(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WARC archives → the canonical raw-pages shape
    ``(url, warc_ts, html:binary)`` that `pipeline.ingest_pages`
    consumes: 2xx html responses only, still one-file-per-task and
    zero driver-side data movement."""
    from pyspark.sql import functions as F
    recs = read_warc(spark, paths)
    return (recs
            .filter((F.col("record_type") == "response")
                    & F.col("http_status").between(200, 299)
                    & (F.lower(F.trim(F.split(F.col("content_type"), ";")[0]))
                       == "text/html"))
            .select("url", "warc_ts", F.col("payload").alias("html")))


# ------------------------------------------------------------------ write

def _warc_record(rtype: str, headers: list[tuple[str, str]],
                 block: bytes) -> bytes:
    rid = hashlib.sha256(
        repr((rtype, headers)).encode() + block).hexdigest()
    head = [f"WARC/1.0",
            f"WARC-Type: {rtype}",
            f"WARC-Record-ID: <urn:sha256:{rid}>"]
    head += [f"{k}: {v}" for k, v in headers]
    head.append(f"Content-Length: {len(block)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + block + b"\r\n\r\n"


def write_warc(df: DataFrame, path: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", html_col: str = "html",
               http_content_type: str = "text/html; charset=utf-8",
               compress: bool = True) -> int:
    """Export pages as a WARC file of HTTP response records, one gzip
    member per record (the Common Crawl convention — members can be
    located and decompressed independently). Deterministic output:
    record IDs are content hashes, no clocks, no randomness. Returns
    the record count (excluding the leading warcinfo)."""
    rows = df.select(url_col, ts_col, html_col).collect()  # collect-ok: bounded edge-format export (one archive file)
    out = open(path, "wb")
    pack = gzip.compress if compress else (lambda b: b)
    try:
        info = b"software: spandex_spark.sources.warc\r\nformat: WARC File Format 1.0\r\n"
        # WARC-Date is mandatory on EVERY record (spec 5.4); stay
        # deterministic by stamping the max page timestamp, not a clock
        info_date = max((r[1] for r in rows if r[1] is not None),
                        default=None)
        out.write(pack(_warc_record(
            "warcinfo",
            [("WARC-Date", info_date.strftime(_DATE_FMT) if info_date
              else "1970-01-01T00:00:00Z"),
             ("Content-Type", "application/warc-fields"),
             ("WARC-Filename", os.path.basename(path))], info)))
        n = 0
        for r in rows:
            url, ts, body = r[0], r[1], bytes(r[2])
            http = (f"HTTP/1.1 200 OK\r\nContent-Type: {http_content_type}"
                    f"\r\nContent-Length: {len(body)}\r\n\r\n"
                    ).encode() + body
            date = ts.strftime(_DATE_FMT) if ts is not None else \
                "1970-01-01T00:00:00Z"
            out.write(pack(_warc_record(
                "response",
                [("WARC-Target-URI", url), ("WARC-Date", date),
                 ("Content-Type", "application/http; msgtype=response")],
                http)))
            n += 1
        return n
    finally:
        out.close()


def write_wet(df: DataFrame, path: str, *, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text",
              compress: bool = True) -> int:
    """WET export: ``conversion`` records carrying extracted plain text
    (the Common Crawl *.warc.wet.gz companion format — what most
    text-pipeline consumers actually read). Same member-per-record,
    deterministic-ID contract as `write_warc`; payload is the raw
    UTF-8 text, no HTTP envelope (per the WET convention).
    `read_warc` reads these back as record_type='conversion' with the
    text bytes in ``payload``."""
    rows = df.select(url_col, ts_col, text_col).collect()  # collect-ok: bounded edge-format export (one archive file)
    pack = gzip.compress if compress else (lambda b: b)
    n = 0
    with open(path, "wb") as out:
        info = (b"software: spandex_spark.sources.warc\r\n"
                b"format: WARC File Format 1.0\r\n"
                b"conversion: text extraction\r\n")
        info_date = max((r[1] for r in rows if r[1] is not None),
                        default=None)
        out.write(pack(_warc_record(
            "warcinfo",
            [("WARC-Date", info_date.strftime(_DATE_FMT) if info_date
              else "1970-01-01T00:00:00Z"),
             ("Content-Type", "application/warc-fields"),
             ("WARC-Filename", os.path.basename(path))], info)))
        for r in rows:
            url, ts, text = r[0], r[1], r[2]
            body = (text or "").encode("utf-8")
            date = ts.strftime(_DATE_FMT) if ts is not None else \
                "1970-01-01T00:00:00Z"
            out.write(pack(_warc_record(
                "conversion",
                [("WARC-Target-URI", url), ("WARC-Date", date),
                 ("Content-Type", "text/plain")], body)))
            n += 1
    return n


def write_wat(df: DataFrame, path: str, *, url_col: str = "url",
              ts_col: str = "warc_ts", html_col: str = "html",
              compress: bool = True) -> int:
    """WAT export: ``metadata`` records carrying per-page JSON (the
    Common Crawl *.warc.wat.gz sidecar — link graph + head metadata
    without the page bytes).  Documented envelope subset:
    ``Envelope.WARC-Header-Metadata`` (target URI, date) and
    ``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata``
    with ``Head.Title`` and ``Links`` ([{"url": ...}] — absolute
    http(s) hrefs, the linkgraph.extract_links rule).

    The heavy work (title/link extraction, JSON rendering) runs
    DISTRIBUTED as codegen (regexp + to_json); only finished JSON
    strings reach the driver for the member-per-record file write —
    the same bounded edge-format export contract as write_warc."""
    h = F.col(html_col)
    html = F.when(h.isNotNull(), h.cast("string"))
    links = F.regexp_extract_all(
        html, F.lit(r"""(?i)href\s*=\s*["'](https?://[^"'\s>#]+)"""), 1)
    title = F.regexp_extract(
        html, r"(?is)<title[^>]*>\s*(.*?)\s*</title>", 1)
    payload = F.to_json(F.struct(F.struct(
        F.struct(F.col(url_col).alias("WARC-Target-URI"),
                 F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
                 .alias("WARC-Date")).alias("WARC-Header-Metadata"),
        F.struct(F.struct(F.struct(
            F.struct(title.alias("Title")).alias("Head"),
            F.transform(links, lambda u: F.struct(u.alias("url")))
            .alias("Links")).alias("HTML-Metadata"))
            .alias("HTTP-Response-Metadata")).alias("Payload-Metadata"))
        .alias("Envelope")))
    rows = df.select(F.col(url_col), F.col(ts_col),
                     payload.alias("_wat")).collect()  # collect-ok: bounded edge-format export (one archive file)
    pack = gzip.compress if compress else (lambda b: b)
    n = 0
    with open(path, "wb") as out:
        info = (b"software: spandex_spark.sources.warc\r\n"
                b"format: WARC File Format 1.0\r\n"
                b"extracted: page metadata\r\n")
        info_date = max((r[1] for r in rows if r[1] is not None),
                        default=None)
        out.write(pack(_warc_record(
            "warcinfo",
            [("WARC-Date", info_date.strftime(_DATE_FMT) if info_date
              else "1970-01-01T00:00:00Z"),
             ("Content-Type", "application/warc-fields"),
             ("WARC-Filename", os.path.basename(path))], info)))
        for r in rows:
            url, ts, js = r[0], r[1], r[2]
            date = ts.strftime(_DATE_FMT) if ts is not None else \
                "1970-01-01T00:00:00Z"
            out.write(pack(_warc_record(
                "metadata",
                [("WARC-Target-URI", url), ("WARC-Date", date),
                 ("Content-Type", "application/json")],
                (js or "{}").encode("utf-8"))))
            n += 1
    return n
