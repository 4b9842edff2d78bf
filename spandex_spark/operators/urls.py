"""URL parsing / normalization / per-domain aggregation for crawl tables.

The pages table keys rows by ``url`` (BASELINE input_hint), and every
real crawl pipeline needs the URL axis early: host/domain grouping for
politeness and per-site quality priors, URL canonicalization before
exact dedup (the same document fetched as ``HTTP://Site.Example:80/a#x``
and ``http://site.example/a`` must collide), and per-domain corpus
stats. spandex has no URL layer (it keys by parcel id); this module is
part of the webtext graft surface, like `operators/textstats.py`.

Everything is JVM whole-stage codegen: Spark's `parse_url` (HOST/PATH/
QUERY/PROTOCOL/REF) plus `regexp_replace` chains — no Python anywhere,
these run per-row over 10^12 urls.

Registrable domain is a documented HEURISTIC, not the Public Suffix
List (the PSL is a data file, not an algorithm; shipping a stale copy
silently mis-groups new suffixes, so we state the approximation
instead): take the last two host labels, or the last three when the
second-to-last label is a well-known second-level registry label
(``co, com, net, org, gov, edu, ac, gob, or, ne``) AND the TLD is
2 letters (``bbc.co.uk`` -> ``bbc.co.uk``, ``x.com.au`` -> ``x.com.au``,
but ``a.b.example.com`` -> ``example.com``). IP hosts pass through
whole. Callers with a PSL on hand can join it against ``host`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# second-level labels that commonly sit under a 2-letter ccTLD
_SLD = ("co", "com", "net", "org", "gov", "edu", "ac", "gob", "or", "ne")


def _part(url: Column, what: str) -> Column:
    return F.parse_url(url, F.lit(what))


def url_parts(df: DataFrame, *, url_col: str = "url",
              prefix: str = "") -> DataFrame:
    """Add ``scheme, host, port, path, query, fragment, domain`` columns
    (``prefix`` prepended to each) parsed from ``url_col``. Unparseable
    urls yield NULL parts, never an error."""
    url = F.col(url_col)
    host_port = _part(url, "HOST")  # spark's HOST already excludes port
    port = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:(\d+)", 1)
    out = (df
           .withColumn(prefix + "scheme",
                       F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)))
           .withColumn(prefix + "host", F.lower(host_port))
           .withColumn(prefix + "port",
                       F.when(port != "", port.cast("int")))
           .withColumn(prefix + "path", _part(url, "PATH"))
           .withColumn(prefix + "query", _part(url, "QUERY"))
           .withColumn(prefix + "fragment", _part(url, "REF")))
    return out.withColumn(prefix + "domain",
                          registrable_domain(F.col(prefix + "host")))


def registrable_domain(host: Column) -> Column:
    """Heuristic registrable domain of a lowercase host (module docstring
    states the approximation vs the Public Suffix List)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    take3 = (n >= 3) & (F.length(tld) == 2) & sld.isin(*_SLD)
    last2 = F.concat_ws(".", F.element_at(labels, -2), tld)
    last3 = F.concat_ws(".", F.element_at(labels, -3), sld, tld)
    return (F.when(host.isNull() | (host == ""), F.lit(None))
            .when(is_ip | (n <= 2), host)
            .when(take3, last3)
            .otherwise(last2))


def normalize_url(df: DataFrame, *, url_col: str = "url",
                  out_col: str = "url_norm",
                  drop_query: bool = False) -> DataFrame:
    """Canonicalize for dedup: lowercase scheme+host, strip the fragment,
    strip explicit default ports (:80 http, :443 https), collapse empty
    path to ``/``, optionally drop the whole query string. Values and
    case of path/query are preserved (they are semantically significant).
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^#]*)", 1)
    # split authority from path+query at the first / or ?
    authority = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    authority = F.when(scheme == "http",
                       F.regexp_replace(authority, r":80$", "")) \
                 .when(scheme == "https",
                       F.regexp_replace(authority, r":443$", "")) \
                 .otherwise(authority)
    if drop_query:
        pathq = F.regexp_replace(pathq, r"\?.*$", "")
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    norm = F.concat(scheme, F.lit("://"), authority, pathq)
    # urls without ://authority (mailto:, relative) pass through untouched
    has_auth = url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    return df.withColumn(out_col, F.when(has_auth, norm).otherwise(url))


def domain_stats(pages: DataFrame, *, url_col: str = "url",
                 text_col: str = "text", exact_hosts: bool = False) -> DataFrame:
    """Per-registrable-domain corpus profile: page count, distinct hosts,
    total/mean text bytes. Default is ONE shuffle (the groupBy), map-side
    partials, with hosts counted by HLL (`approx_count_distinct`) — the
    10^12-row shape. ``exact_hosts=True`` switches to exact
    `countDistinct`, which Spark plans as a SECOND exchange on
    (domain, host); fine for reports, not for the hot path."""
    with_d = url_parts(pages, url_col=url_col)
    n_hosts = (F.countDistinct("host") if exact_hosts
               else F.approx_count_distinct("host"))
    return (with_d.groupBy("domain")
            .agg(F.count("*").alias("n_pages"),
                 n_hosts.alias("n_hosts"),
                 F.sum(F.length(F.col(text_col))).alias("text_bytes"),
                 F.avg(F.length(F.col(text_col))).alias("mean_text_len")))


def parse_sitemap(df: DataFrame, *, xml_col: str = "xml",
                  src_col: str = "url") -> DataFrame:
    """Sitemap XML -> URL rows (the sitemaps.org 0.9 protocol, the
    crawl-frontier feeder next to operators/robots.py).  Handles both
    document kinds: <urlset> (leaf pages) and <sitemapindex> (pointers
    to child sitemaps) — `kind` says which, so a frontier loop knows
    whether to fetch-and-reparse or enqueue pages.

    Output: (src_col, kind ['urlset'|'sitemapindex'], loc, lastmod
    [string, NULL if absent]).  Pure JVM: one regexp_extract_all over
    <url>/<sitemap> blocks, explode, per-block regexp_extract — the
    html.py heuristic level (regex, not an XML parser: fine for the
    machine-generated XML sitemaps are, documented).  &amp;/&lt;/&gt;
    entity-decode on loc per the protocol's escaping rules."""
    xml = F.col(xml_col)
    kind = F.when(xml.rlike("(?is)<\\s*sitemapindex"),
                  F.lit("sitemapindex")) \
        .when(xml.rlike("(?is)<\\s*urlset"), F.lit("urlset"))
    blocks = F.regexp_extract_all(
        xml, F.lit(r"(?is)(<(?:url|sitemap)\b.*?</(?:url|sitemap)\s*>)"), 1)
    out = (df.select(F.col(src_col), kind.alias("kind"),
                     F.explode(blocks).alias("_blk"))
           .filter(F.col("kind").isNotNull()))
    loc = F.regexp_extract("_blk", r"(?is)<loc>\s*(.*?)\s*</loc>", 1)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        loc = F.regexp_replace(loc, ent, ch)
    lastmod = F.regexp_extract("_blk",
                               r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    return (out.select(src_col, "kind", loc.alias("loc"),
                       F.when(lastmod != "", lastmod).alias("lastmod"))
            .filter(F.col("loc") != ""))


def frontier_batches(urls: DataFrame, *, url_col: str = "url",
                     per_host: int = 10,
                     priority_col: str | None = None) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: assign every URL a
    `fetch_batch` such that no batch contains more than `per_host`
    URLs of one host — the standard frontier shape (Mercator-style
    host queues; a fleet fetching batch k in parallel touches each
    host at most `per_host` times per wave, pair with
    operators/robots.py for the allow gate).

    Rank within host by `priority_col` DESCENDING when given (e.g. a
    pagerank or bm25 score), else by URL ascending — deterministic
    either way (URL is the tiebreak).  fetch_batch = (per-host rank)
    div per_host, 0-based.  ONE window shuffle on host, pure JVM.
    Output: input columns + host + fetch_batch."""
    if per_host < 1:
        raise ValueError("per_host must be >= 1")
    from pyspark.sql import Window
    host = F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col).asc()]
    w = Window.partitionBy("host").orderBy(*order)
    return (urls.withColumn("host", host)
            .withColumn("fetch_batch",
                        F.floor((F.row_number().over(w) - 1)
                                / F.lit(per_host)).cast("int")))
