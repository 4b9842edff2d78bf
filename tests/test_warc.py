"""WARC source (sources/warc.py): spec-level container checks, exact
payload round-trip, dirty-record tolerance, and ingest_pages parity."""

import gzip
import os
import zlib

import pytest

from spandex_spark.sources.warc import (read_warc, read_warc_pages,
                                        write_warc)


def _pages(spark, fixture_dir, n=40):
    df = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    return df.orderBy("url").limit(n)


def test_roundtrip_exact(spark, fixture_dir, tmp_path):
    p = str(tmp_path / "crawl.warc.gz")
    src = _pages(spark, fixture_dir)
    n = write_warc(src, p)
    assert n == 40
    back = {r["url"]: r for r in read_warc_pages(spark, p).collect()}
    orig = {r["url"]: r for r in src.collect()}
    assert set(back) == set(orig)
    for url, r in orig.items():
        assert bytes(back[url]["html"]) == bytes(r["html"])
        assert back[url]["warc_ts"] == r["warc_ts"]


def test_gzip_member_per_record(spark, fixture_dir, tmp_path):
    """The CC convention the docstring promises: every record its own
    gzip member, independently decompressible."""
    p = str(tmp_path / "members.warc.gz")
    n = write_warc(_pages(spark, fixture_dir, 10), p)
    raw = open(p, "rb").read()
    members = 0
    pos = 0
    while pos < len(raw):
        assert raw[pos:pos + 2] == b"\x1f\x8b"
        d = zlib.decompressobj(wbits=31)
        d.decompress(raw[pos:])
        consumed = len(raw) - pos - len(d.unused_data)
        # each member is one full record
        assert d.flush() == b""
        members += 1
        pos += consumed
    assert members == n + 1  # + warcinfo


def test_record_level_fields_and_dirty_records(spark, tmp_path):
    """Hand-built archive: warcinfo, a 404, a png resource, an
    LF-only-headers record — read_warc surfaces all, read_warc_pages
    keeps only the 2xx html response."""
    def rec(head: bytes, block: bytes, nl: bytes = b"\r\n") -> bytes:
        return (head + b"Content-Length: " + str(len(block)).encode()
                + nl + nl + block + b"\r\n\r\n")

    def http(status: bytes, body: bytes) -> bytes:
        return (b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body)

    recs = [
        rec(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n", b"foo: bar\n"),
        rec(b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/ok\r\n"
            b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n",
            http(b"200 OK", b"<p>hello</p>")),
        rec(b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/gone\r\n"
            b"WARC-Date: 2026-01-02T03:04:06Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n",
            http(b"404 Not Found", b"")),
        rec(b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Target-URI: https://a.example/logo.png\r\n"
            b"WARC-Date: 2026-01-02T03:04:07Z\r\n"
            b"Content-Type: image/png\r\n", b"PNG!"),
        # bare-LF header block (dirty but seen in the wild)
        rec(b"WARC/1.0\nWARC-Type: response\n"
            b"WARC-Target-URI: https://a.example/lf\n"
            b"WARC-Date: 2026-01-02T03:04:08Z\n"
            b"Content-Type: application/http; msgtype=response\n",
            http(b"200 OK", b"0123456789"), nl=b"\n"),
    ]
    p = str(tmp_path / "mixed.warc.gz")
    with open(p, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))

    all_rows = {(r["record_type"], r["url"]): r
                for r in read_warc(spark, p).collect()}
    assert len(all_rows) == 5
    ok = all_rows[("response", "https://a.example/ok")]
    assert ok["http_status"] == 200
    assert ok["content_type"] == "text/html"
    assert bytes(ok["payload"]) == b"<p>hello</p>"
    assert str(ok["warc_ts"]).startswith("2026-01-02 03:04:05")
    assert all_rows[("response", "https://a.example/gone")]["http_status"] == 404
    png = all_rows[("resource", "https://a.example/logo.png")]
    assert png["content_type"] == "image/png"
    assert bytes(png["payload"]) == b"PNG!"
    assert all_rows[("warcinfo", None)]["url"] is None
    lf = all_rows[("response", "https://a.example/lf")]
    assert bytes(lf["payload"]) == b"0123456789"

    pages = read_warc_pages(spark, p).collect()
    assert [r["url"] for r in pages] == ["https://a.example/ok",
                                         "https://a.example/lf"]


def test_multi_file_one_task_each(spark, fixture_dir, tmp_path):
    src = _pages(spark, fixture_dir, 30).collect()
    paths = []
    for i in range(3):
        chunk = spark.createDataFrame(src[i * 10:(i + 1) * 10])
        p = str(tmp_path / f"part-{i}.warc.gz")
        write_warc(chunk, p)
        paths.append(p)
    recs = read_warc(spark, str(tmp_path / "part-*.warc.gz"))
    assert recs.rdd.getNumPartitions() == 3
    per_file = {r["warc_file"]: r["count"] for r in
                recs.groupBy("warc_file").count().collect()}
    assert per_file == {f"part-{i}.warc.gz": 11 for i in range(3)}
    # record_seq is a dense per-file sequence
    seqs = sorted(r["record_seq"] for r in recs.collect()
                  if r["warc_file"] == "part-0.warc.gz")
    assert seqs == list(range(11))


def test_uncompressed_warc(spark, fixture_dir, tmp_path):
    p = str(tmp_path / "plain.warc")
    write_warc(_pages(spark, fixture_dir, 5), p, compress=False)
    assert open(p, "rb").read(5) == b"WARC/"
    assert read_warc_pages(spark, p).count() == 5


def test_ingest_parity_through_warc(spark, fixture_dir, tmp_path):
    """warc → read_warc_pages → ingest_pages reproduces the fixture
    text column byte-for-byte (the north-rule extraction invariant,
    now through the archive round-trip)."""
    from spandex_spark.pipeline import ingest_pages
    p = str(tmp_path / "pipe.warc.gz")
    src = _pages(spark, fixture_dir)
    write_warc(src, p)
    out = ingest_pages(read_warc_pages(spark, p))
    got = {r["url"]: r["text"] for r in out.collect()}
    want = {r["url"]: r["text"] for r in src.collect()}
    assert got == want


def test_missing_file_rejected(spark):
    with pytest.raises(ValueError, match="no such WARC file"):
        read_warc(spark, "/nonexistent/x.warc.gz")


def test_wet_round_trip(spark, fixture_dir, tmp_path):
    """WET conversion records: extracted text round-trips byte-exact
    and read_warc surfaces them as record_type='conversion'."""
    from spandex_spark.sources.warc import write_wet
    p = str(tmp_path / "crawl.warc.wet.gz")
    src = _pages(spark, fixture_dir, 20)
    assert write_wet(src, p) == 20
    recs = read_warc(spark, p)
    conv = {r["url"]: r for r in
            recs.filter("record_type = 'conversion'").collect()}
    want = {r["url"]: r for r in src.collect()}
    assert set(conv) == set(want)
    for url, r in want.items():
        assert bytes(conv[url]["payload"]).decode("utf-8") == r["text"]
        assert conv[url]["content_type"] == "text/plain"
        assert conv[url]["http_status"] is None


def test_content_type_case_insensitive(spark, tmp_path):
    """'Text/HTML' with charset still counts as an html response
    (review finding)."""
    body = b"<p>x</p>"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://a.example/up\r\n"
           b"WARC-Date: 2026-01-02T00:00:00Z\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           b"Content-Length: %d\r\n\r\n" % (59 + len(body))
           + b"HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=UTF-8\r\n"
           b"\r\n" + body + b"\r\n\r\n")
    p = str(tmp_path / "case.warc.gz")
    open(p, "wb").write(gzip.compress(rec))
    pages = read_warc_pages(spark, p).collect()
    assert len(pages) == 1 and bytes(pages[0]["html"]) == body


def test_warcinfo_has_mandatory_date(spark, fixture_dir, tmp_path):
    p = str(tmp_path / "dated.warc.gz")
    write_warc(_pages(spark, fixture_dir, 5), p)
    info = read_warc(spark, p).filter("record_type = 'warcinfo'").collect()
    assert len(info) == 1 and info[0]["warc_ts"] is not None


def test_wat_metadata_records(spark, tmp_path):
    """WAT sidecar: metadata records carry the Envelope JSON with head
    title and absolute links, parseable and matching extract_links."""
    import json
    import datetime
    from spandex_spark.sources.warc import write_wat
    html1 = (b"<html><head><title> Page One </title></head>"
             b"<body><a href='https://a.example/x'>x</a>"
             b"<a href=\"http://b.example/y#frag\">y</a>"
             b"<a href='/relative'>rel</a></body></html>")
    html2 = b"<html><body>no title no links</body></html>"
    src = spark.createDataFrame(
        [("https://site.example/1", datetime.datetime(2024, 3, 1), html1),
         ("https://site.example/2", datetime.datetime(2024, 3, 2), html2)],
        "url string, warc_ts timestamp, html binary")
    p = str(tmp_path / "crawl.warc.wat.gz")
    assert write_wat(src, p) == 2
    recs = {r["url"]: r for r in
            read_warc(spark, p).filter("record_type = 'metadata'")
            .collect()}
    assert set(recs) == {"https://site.example/1", "https://site.example/2"}
    env1 = json.loads(bytes(recs["https://site.example/1"]["payload"])
                      .decode())["Envelope"]
    assert env1["WARC-Header-Metadata"]["WARC-Target-URI"] == \
        "https://site.example/1"
    hm = env1["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "Page One"
    assert [e["url"] for e in hm["Links"]] == \
        ["https://a.example/x", "http://b.example/y"]
    env2 = json.loads(bytes(recs["https://site.example/2"]["payload"])
                      .decode())["Envelope"]
    hm2 = env2["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm2["Head"]["Title"] == "" and hm2["Links"] == []
    assert recs["https://site.example/1"]["content_type"] == \
        "application/json"
