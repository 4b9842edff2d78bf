"""HTML -> text extraction for Common-Crawl-style page tables.

The engine's input contract (BASELINE input_hint; FIXTURES.md §1) is a
pages table ``(url, warc_ts, html:binary, text, lang)`` whose ``text``
column is *the extracted text of the html column* — and the north-rule
per-row invariant is that extracted text stays byte-identical per url
through the whole pipeline.  This module is the extraction step itself:
``extract_text`` turns the raw ``html`` bytes back into that text
column, so a user can ingest crawl data that arrives html-only.

Reference parity: spandex itself never parses HTML (it loads PostGIS
tables), but the graft's north star is "geotagged via extracted page
text" over crawl pages, which makes the html->text step part of this
engine's canonical surface, on par with `geotag.py`.

Two paths, same split as `geotag.py` (regex vs tokens):

* ``mode="jvm"`` (default, the 10^12-row path): a whole-stage-codegen
  chain of `decode` + `regexp_replace` — strips comments,
  script/style/noscript/template blocks (content and all), collapses
  every remaining tag, then decodes the named entities
  ``&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;`` (ampersand LAST so
  ``&amp;lt;`` correctly yields the literal ``&lt;``).  Numeric
  character references beyond ``&#39;`` are NOT decoded on this path
  (regexp_replace cannot map a matched number to a codepoint); they
  pass through literally, documented.
* ``mode="full"``: an Arrow-batched `mapInPandas` pass that runs the
  same block/tag stripping with Python `re` and then stdlib
  `html.unescape`, which decodes ALL named and numeric character
  references.  Use when the corpus actually carries exotic entities;
  it is the slow path and says so.

Whitespace contract: by default the extractor inserts nothing and
collapses nothing — tags are replaced by the empty string, so a page
whose body is plain text round-trips byte-identically (the fixture
invariant: ``extract_text(html) == text`` for every `gen_pages` row,
asserted in tests/test_html.py and enforced end-to-end by the
`text_integrity` driver query).  Pass ``block_sep="\\n"`` (or `" "`) to
emit a separator where block-level tags (p/div/br/li/tr/h1..h6/…)
closed, followed by a whitespace-collapse — the shape real extractors
produce; that mode is NOT byte-stable and is meant for new corpora,
not for reproducing an existing text column.

Invalid UTF-8 in the binary column follows Spark's `decode` semantics
(replacement characters), never an error — crawl data is dirty.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# blocks whose CONTENT is dropped wholesale (scripts are not text)
_DROP_BLOCKS = ("script", "style", "noscript", "template")
# tags that end a text block when block_sep is requested
_BLOCK_TAGS = ("p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|"
               "header|footer|blockquote|pre|form|title")

# named entities the JVM path decodes, applied in order (amp LAST)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"),
             ("&nbsp;", "\u00a0"),  # NBSP, matching stdlib html.unescape
             ("&amp;", "&")]


def _strip_expr(col, block_sep: str | None):
    """The shared JVM regexp chain over a *string* column."""
    s = col
    # comments first (may contain tag-lookalikes)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    for blk in _DROP_BLOCKS:
        s = F.regexp_replace(
            s, rf"(?is)<{blk}\b[^>]*>.*?</{blk}\s*>", "")
    if block_sep is not None:
        # closing/void block tags become the separator, then collapse
        s = F.regexp_replace(
            s, rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*/?>", block_sep)
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    if block_sep is not None:
        s = F.trim(F.regexp_replace(s, r"\s+", " ")) if block_sep == " " \
            else F.trim(F.regexp_replace(s, r"\s*\n\s*(\s*\n\s*)*", "\n"))
    return s


def extract_text(pages: DataFrame, *, html_col: str = "html",
                 out_col: str = "extracted_text", mode: str = "jvm",
                 block_sep: str | None = None,
                 charset: str = "UTF-8") -> DataFrame:
    """Add ``out_col`` = text extracted from the ``html_col`` bytes.

    ``mode="jvm"`` stays entirely in whole-stage codegen (asserted by
    tests/test_html.py's plan check); ``mode="full"`` adds stdlib
    `html.unescape` entity coverage via one Arrow mapInPandas pass.
    """
    if mode == "jvm":
        # spark's StringDecode codegen NPEs on NULL binary input
        # (observed on 4.1, tests/test_html.py::test_null_html_yields_null)
        # so the null guard is explicit
        raw = F.when(F.col(html_col).isNotNull(),
                     F.decode(F.col(html_col), charset))
        return pages.withColumn(out_col, _strip_expr(raw, block_sep))
    if mode != "full":
        raise ValueError(f"mode must be 'jvm' or 'full', got {mode!r}")

    import re as _re

    drop = [_re.compile(rf"(?is)<{b}\b[^>]*>.*?</{b}\s*>")
            for b in _DROP_BLOCKS]
    comment = _re.compile(r"(?s)<!--.*?-->")
    blockre = _re.compile(rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*/?>")
    anytag = _re.compile(r"(?s)<[^>]*>")
    sep = block_sep

    # nullable output field — F.lit("x") would mark it non-nullable and
    # the UnsafeProjection then NPEs on a null extraction
    out_schema = pages.withColumn(
        out_col, F.lit(None).cast("string")).schema
    cols = [f.name for f in pages.schema.fields]

    def _batches(it: Iterator) -> Iterator:
        import html as _html

        import pandas as pd

        def one(b: bytes | None):
            if b is None:
                return None
            s = bytes(b).decode(charset.lower().replace("-", ""),
                                errors="replace")
            s = comment.sub("", s)
            for rx in drop:
                s = rx.sub("", s)
            if sep is not None:
                s = blockre.sub(sep, s)
            s = anytag.sub("", s)
            s = _html.unescape(s)
            if sep == " ":
                s = " ".join(s.split())
            elif sep is not None:
                s = "\n".join(x for x in (ln.strip()
                                          for ln in s.split("\n")) if x)
            return s

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [one(v) for v in pdf[html_col]], index=pdf.index,
                dtype=object)
            yield pdf[cols + [out_col]]

    return pages.mapInPandas(_batches, schema=out_schema)


def verify_extraction(pages: DataFrame, *, html_col: str = "html",
                      text_col: str = "text", **kw) -> DataFrame:
    """North-rule audit: re-extract and compare against the carried text
    column byte-for-byte (via sha256 over UTF-8, computed JVM-side).
    Returns (url, ok) — aggregate ``F.min(ok)`` for a corpus-level gate.
    """
    df = extract_text(pages, html_col=html_col, out_col="_rextract", **kw)
    ok = (F.sha2(F.encode(F.col("_rextract"), "UTF-8"), 256)
          == F.sha2(F.encode(F.col(text_col), "UTF-8"), 256))
    return df.select("url", ok.alias("ok"))


def _meta_attr_expr(s, name_attr: str, name_val: str,
                    take_attr: str = "content"):
    """Extract `take_attr`'s value from the tag where
    `name_attr`="`name_val`", tolerating either attribute order —
    coalesce of the two regexp_extract orientations (the documented
    heuristic level of this module: regex, not a parser)."""
    fwd = F.regexp_extract(
        s, rf'(?is)<[^>]*\b{name_attr}\s*=\s*["\']{name_val}["\']'
           rf'[^>]*\b{take_attr}\s*=\s*["\']([^"\']*)["\']', 1)
    rev = F.regexp_extract(
        s, rf'(?is)<[^>]*\b{take_attr}\s*=\s*["\']([^"\']*)["\']'
           rf'[^>]*\b{name_attr}\s*=\s*["\']{name_val}["\']', 1)
    got = F.when(fwd != "", fwd).otherwise(rev)
    return F.when(got != "", got)          # "" -> NULL


def _decode_entities(col):
    s = col
    for ent, ch in _ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    return s


def extract_metadata(pages: DataFrame, *, html_col: str = "html",
                     charset: str = "UTF-8") -> DataFrame:
    """Append the head metadata every crawl pipeline wants BEFORE text
    extraction: page_title, meta_description, canonical_url, base_href,
    og_title, html_lang, meta_robots, and the derived `noindex` flag
    (RFC 9309's on-page cousin — corpus pipelines must honor it like
    robots.txt, operators/robots.py).

    Pure JVM regexp codegen over the decoded html (zero shuffle, zero
    Python); entity decoding for the human-text fields (title,
    description, og_title) uses the module's named-entity chain with
    the same numeric-reference caveat as ``extract_text(mode="jvm")``.
    Absent fields are NULL, never ''."""
    s = F.when(F.col(html_col).isNotNull(),
               F.decode(F.col(html_col), charset))
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    title = F.regexp_extract(s, r"(?is)<title\b[^>]*>(.*?)</title", 1)
    title = F.when(F.trim(title) != "", F.trim(title))
    lang = F.regexp_extract(
        s, r'(?is)<html\b[^>]*\blang\s*=\s*["\']([^"\']+)["\']', 1)
    base = F.regexp_extract(
        s, r'(?is)<base\b[^>]*\bhref\s*=\s*["\']([^"\']+)["\']', 1)
    return (pages
            .withColumn("page_title", _decode_entities(title))
            .withColumn("meta_description", _decode_entities(
                _meta_attr_expr(s, "name", "description")))
            .withColumn("canonical_url",
                        _meta_attr_expr(s, "rel", "canonical", "href"))
            .withColumn("base_href", F.when(base != "", base))
            .withColumn("og_title", _decode_entities(
                _meta_attr_expr(s, "property", "og:title")))
            .withColumn("html_lang", F.when(lang != "", F.lower(lang)))
            .withColumn("meta_robots",
                        F.lower(_meta_attr_expr(s, "name", "robots")))
            .withColumn("noindex", F.coalesce(
                F.col("meta_robots").contains("noindex"), F.lit(False))))
