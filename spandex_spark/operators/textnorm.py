"""Unicode/encoding hygiene for crawl text — the normalisation pass a
training-data pipeline runs between extraction and dedup (equivalent
text must hash equal: 'café' composed vs decomposed are different
bytes, so exact/line dedup misses them without NFC).

Reference parity: spandex has no text surface; this is the graft's
webtext axis, the companion to `operators/pii.py` — and like
scrubbing it REWRITES text, so it belongs BEFORE the byte-identity
seal, as the step that defines the canonical bytes.

Two layers, the engine's standard fast/slow split (`html.extract_text`
precedent):

* `encoding_stats` — pure whole-stage codegen: U+FFFD replacement-char
  count (the mojibake tell: broken decode paths emit it), C0/C1
  control-char count (excluding \\t \\n \\r), and their per-char
  ratios. Zero Python; use it to ROUTE (filter or alert) before
  paying for normalisation.
* `normalize_text` — one Arrow `mapInPandas` pass of stdlib
  `unicodedata.normalize` (NFC by default; NFKC folds width/ligature
  compatibility forms — the aggressive choice, stated not defaulted)
  plus optional control-char stripping. Spark has no JVM Unicode
  normaliser, so this is honestly the slow path and says so; it is
  still a map-only stage — no shuffle, fuses with the scan.

Idempotent: normalising normalised text is a byte no-op (Unicode
normal forms are projections), pytested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# C0 except \t\n\r, DEL, C1
_CTRL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"


def encoding_stats(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Add n_replacement / n_control / replacement_ratio /
    control_ratio — all codegen, no Python, no shuffle."""
    s = F.col(text_col)
    ln = F.greatest(F.length(s), F.lit(1))
    return (df
            .withColumn("n_replacement",
                        F.regexp_count(s, F.lit("�")).cast("int"))
            .withColumn("n_control",
                        F.regexp_count(s, F.lit(_CTRL)).cast("int"))
            .withColumn("replacement_ratio",
                        F.col("n_replacement") / ln)
            .withColumn("control_ratio", F.col("n_control") / ln))


def normalize_text(df: DataFrame, *, text_col: str = "text",
                   out_col: str | None = None, form: str = "NFC",
                   strip_control: bool = True) -> DataFrame:
    """Unicode-normalise ``text_col`` (stdlib `unicodedata`, Arrow
    batches). ``out_col=None`` rewrites in place."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normal form {form!r}")
    out = out_col or text_col
    out_df = df.withColumn(out, F.col(text_col))  # fixes schema/position
    import re as _re
    ctrl = _re.compile(_CTRL)

    def norm(batches: Iterator) -> Iterator:
        import unicodedata

        def one(v):
            if v is None:
                return None
            v = unicodedata.normalize(form, v)
            return ctrl.sub("", v) if strip_control else v

        for pdf in batches:
            pdf[out] = pdf[out].map(one)
            yield pdf

    return out_df.mapInPandas(norm, out_df.schema)
