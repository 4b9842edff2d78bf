"""CDXJ capture index (sources/cdx.py): SURT golden vectors, reader
round-trip, malformed-line auditing, pages→index build."""

import os

from pyspark.sql import functions as F

from spandex_spark.sources.cdx import (
    index_pages, read_cdxj, surt_key, to_cdxj_lines)

GOLDEN_SURT = [
    ("https://www.Example.ORG/Path/Page?q=1", "org,example)/path/page?q=1"),
    ("http://sub.host.co.uk/", "uk,co,host,sub)/"),
    ("https://example.com", "com,example)/"),
    ("http://a.b.c/X%2FY", "c,b,a)/x%2fy"),
]


def test_surt_golden_vectors(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN_SURT], "url string")
    got = [r["s"] for r in
           df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [s for _, s in GOLDEN_SURT]


CDXJ_LINES = [
    'org,example)/ 20240315123456 {"url": "https://example.org/", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AAAA", '
    '"length": "1234", "offset": "0", "filename": "seg/part-0.warc.gz"}',
    'org,example)/about 20240315123500 {"url": "https://example.org/about", '
    '"mime": "text/html", "status": "404", "digest": "sha1:BBBB", '
    '"length": "77", "offset": "1234", "filename": "seg/part-0.warc.gz"}',
    "this line is not cdxj",
]


def test_read_cdxj(spark, tmp_path):
    p = os.path.join(tmp_path, "idx.cdxj")
    with open(p, "w") as f:
        f.write("\n".join(CDXJ_LINES) + "\n")
    out = read_cdxj(spark, p)
    rows = {r["surt"]: r for r in out.collect()}
    assert len(rows) == 3 and None in rows
    r0 = rows["org,example)/"]
    assert (r0["url"], r0["status"], r0["length"], r0["offset"]) == \
        ("https://example.org/", "200", 1234, 0)
    assert str(r0["ts"]) == "2024-03-15 12:34:56"
    assert rows[None]["_raw"] == "this line is not cdxj"
    assert rows["org,example)/about"]["digest"] == "sha1:BBBB"


def test_cdxj_roundtrip(spark, tmp_path):
    p = os.path.join(tmp_path, "idx.cdxj")
    with open(p, "w") as f:
        f.write("\n".join(CDXJ_LINES[:2]) + "\n")
    df = read_cdxj(spark, p)
    back = [r["value"] for r in
            to_cdxj_lines(df).orderBy("value").collect()]
    # re-reading the re-written lines reproduces every parsed field
    p2 = os.path.join(tmp_path, "idx2.cdxj")
    with open(p2, "w") as f:
        f.write("\n".join(back) + "\n")
    a = sorted(map(tuple, df.drop("_raw").collect()))
    b = sorted(map(tuple, read_cdxj(spark, p2).drop("_raw").collect()))
    assert a == b


def test_index_pages(spark):
    import datetime
    rows = [("https://www.Example.org/a", datetime.datetime(2024, 1, 2),
             bytearray(b"<html>x</html>"))]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    out = index_pages(pages).collect()
    assert out[0]["surt"] == "org,example)/a"
    import hashlib
    assert out[0]["digest"] == hashlib.sha256(b"<html>x</html>").hexdigest()
