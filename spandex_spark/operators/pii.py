"""PII scrubbing for crawl text — the CCNet/Gopher-style redaction
pass every production training-data pipeline runs before tokenising.

Reference parity: spandex has no text surface (SURVEY.md §1.1); this
belongs to the graft's webtext axis, alongside `textstats.py` and the
Gopher rules (`operators/textstats.py::gopher_flags`).

All of it is whole-stage-codegen JVM: one `regexp_replace` chain per
rule for `scrub_pii`, one `regexp_count` per rule for `pii_stats` —
zero Python in the hot path, no shuffle, so at 100 TB this is a pure
map stage fused into whatever scan feeds it.

The patterns deliberately use the Java∩RE2 regex subset (no
lookaround, no backreferences) so the DuckDB oracle can run the
IDENTICAL pattern — the same contract as `html.extract_text`'s JVM
path.  Rules, applied in this order (earlier rules must not create
text a later rule would eat):

* ``email``  — RFC-5322-ish local@domain.tld → ``<EMAIL>``
* ``ipv4``   — strict dotted quad, each octet 0-255 → ``<IP>``
* ``ssn``    — ``ddd-dd-dddd`` with word boundaries → ``<SSN>``
* ``phone``  — +cc / (area) / separator-carrying 10-digit forms →
  ``<PHONE>``.  Bare 10-digit runs are NOT matched (they are usually
  ids, not phones); a separator or parens is required — the
  conservative side of the Gopher rule.

Byte-identity note: scrubbing REWRITES text, so like
``ingest_pages(dedup_lines=True)`` it intentionally breaks the
north-rule per-url byte-identity with the raw input; run it as the
step that DEFINES the canonical text, not after integrity has been
sealed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

# (rule, pattern, replacement) in application order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone",
     r"(?:\+[0-9]{1,2}[ .\-]?)?(?:\([0-9]{3}\)[ .\-]?|\b[0-9]{3}[ .\-])"
     r"[0-9]{3}[ .\-]?[0-9]{4}\b",
     "<PHONE>"),
]
_BY_NAME = {name: (pat, rep) for name, pat, rep in PII_RULES}


def _check_kinds(kinds) -> list[str]:
    kinds = list(kinds)
    if not kinds:
        raise ValueError("kinds must name at least one PII rule")
    unknown = [k for k in kinds if k not in _BY_NAME]
    if unknown:
        raise ValueError(f"unknown PII rule(s) {unknown}; "
                         f"have {[n for n, _, _ in PII_RULES]}")
    # preserve canonical application order regardless of caller order
    return [n for n, _, _ in PII_RULES if n in kinds]


def scrub_pii(df: DataFrame, *, text_col: str = "text",
              out_col: str | None = None,
              kinds=("email", "ipv4", "ssn", "phone")) -> DataFrame:
    """Replace each matched span with its ``<KIND>`` token.

    ``out_col=None`` rewrites ``text_col`` in place (the pipeline
    shape); name an ``out_col`` to keep the original for audit.
    Idempotent: the replacement tokens contain no scrubable text.
    """
    s = F.col(text_col)
    for name in _check_kinds(kinds):
        pat, rep = _BY_NAME[name]
        s = F.regexp_replace(s, pat, rep)
    return df.withColumn(out_col or text_col, s)


def pii_stats(df: DataFrame, *, text_col: str = "text",
              kinds=("email", "ipv4", "ssn", "phone")) -> DataFrame:
    """Add one ``n_<kind>`` int column per rule (match counts on the
    UNscrubbed text) plus ``n_pii`` — the audit/reporting companion,
    also pure codegen."""
    names = _check_kinds(kinds)
    for name in names:
        pat, _ = _BY_NAME[name]
        df = df.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("int"))
    total = None
    for name in names:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return df.withColumn("n_pii", total.cast("int"))
