"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Everything here is built-in pyspark.sql.functions (JVM, codegen) — no
Python at all; these run per-row over 10^12 documents so staying inside
whole-stage codegen is the entire design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}


def token_count(df: DataFrame, *, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count (BPE-ish regex variant in ``bpe_piece_count``)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    return df.withColumn(out_col, n.cast("long"))


def bpe_piece_count(df: DataFrame, *, text_col: str = "text",
                    out_col: str = "n_pieces") -> DataFrame:
    """BPE-ish subword proxy: count word chunks + digit runs + punctuation
    singles (regexp, JVM-side)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"([A-Za-z]{1,8}|[0-9]+|[^\sA-Za-z0-9])"), 1)
    return df.withColumn(out_col, F.size(pieces).cast("long"))


def quality_score(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1]; standard web-corpus filtering signals."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = F.split(F.trim(text), r"\s+")
    n_words = F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(toks))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_stop = F.size(F.filter(
        toks, lambda t: F.lower(t).isin(*_LANG_MARKERS["en"])))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1))
    mean_wlen = n_chars.cast("double") / F.greatest(n_words, F.lit(1))
    score = (F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.5
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
             + F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 0.2).otherwise(0.0))
    return (df.withColumn("n_chars_q", n_chars.cast("long"))
            .withColumn("n_words", n_words.cast("long"))
            .withColumn("alpha_ratio", alpha_ratio)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("stop_ratio", stop_ratio)
            .withColumn("quality", score))


def lang_id(df: DataFrame, *, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Stopword-count language heuristic: argmax of per-language marker hits
    (deterministic tiebreak by language code)."""
    toks = F.transform(F.split(F.trim(F.col(text_col)), r"\s+"),
                       lambda t: F.lower(t))
    entries = []
    for lang, words in sorted(_LANG_MARKERS.items()):
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        entries.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def fingerprint(df: DataFrame, *, text_col: str = "text",
                out_col: str = "fingerprint", algo: str = "xxhash64") -> DataFrame:
    """Document fingerprint of the whitespace-normalized, lowercased text
    (rolling-hash analog, JVM-side). ``algo``: 'xxhash64' (engine-native,
    64-bit) or 'md5' (hex string, reproducible by external SQL engines)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    fp = F.xxhash64(norm) if algo == "xxhash64" else F.md5(norm)
    return df.withColumn(out_col, fp)


def gopher_rules(df: DataFrame, *, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 max_ellipsis_ratio: float = 0.3,
                 min_alpha_word_ratio: float = 0.8,
                 min_stopword_hits: int = 2) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, "Scaling
    Language Models", App. A1.1 — the standard web-corpus document
    filter; thresholds are the published defaults, all overridable).
    Adds one boolean column per rule plus ``gopher_pass`` (AND of all),
    entirely in whole-stage codegen — this runs per-row over the full
    crawl before anything expensive touches the text.

    Rules: word count in [min, max]; mean word length in [3, 10]; hash/
    ellipsis symbol ratio <= 0.1; <= 90% of lines starting with a bullet;
    <= 30% of lines ending with an ellipsis; >= 80% of words with at
    least one alphabetic char; >= 2 English stopword hits (the published
    rule uses a fixed small stopword list; ours is `_LANG_MARKERS['en']`
    plus 'that/with', documented deviation — swap via quality pipelines
    per language)."""
    text = F.col(text_col)
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_chars_in_words = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wlen = n_chars_in_words.cast("double") / F.greatest(n_words, F.lit(1))
    n_sym = (F.length(F.regexp_replace(text, r"[^#]", ""))
             + F.size(F.split(text, r"\.\.\.", -1)) - 1
             + F.size(F.split(text, "…", -1)) - 1)
    lines = F.split(text, r"\n", -1)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^([-*•‣▪]|\d+[.)])")))
    n_ellip = F.size(F.filter(
        lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$")))
    n_alpha_words = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]")))
    stop_set = list(_LANG_MARKERS["en"]) + ["that", "with"]
    n_stop = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*stop_set)))
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wlen >= min_mean_word_len)
                           & (mean_wlen <= max_mean_word_len),
        "r_symbol_ratio": (n_sym.cast("double") / safe_words)
                          <= max_symbol_ratio,
        "r_bullet_ratio": (n_bullet.cast("double") / safe_lines)
                          <= max_bullet_ratio,
        "r_ellipsis_ratio": (n_ellip.cast("double") / safe_lines)
                            <= max_ellipsis_ratio,
        "r_alpha_word_ratio": (n_alpha_words.cast("double") / safe_words)
                              >= min_alpha_word_ratio,
        "r_stopwords": n_stop >= min_stopword_hits,
    }
    out = df
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    gate = None
    for name in rules:
        gate = F.col(name) if gate is None else gate & F.col(name)
    return out.withColumn("gopher_pass", gate)


def repetition_ratios(df: DataFrame, *, text_col: str = "text",
                      max_dup_line_frac: float = 0.3,
                      max_dup_line_char_frac: float = 0.2,
                      max_top_word_frac: float = 0.2) -> DataFrame:
    """The Gopher repetitious-text signals (Rae et al. 2021 App. A1.2 —
    the companion to `gopher_rules`' quality section): per document,

    * ``dup_line_frac`` — fraction of lines that are repeats of an
      earlier line in the SAME document;
    * ``dup_line_char_frac`` — fraction of characters inside the repeat
      OCCURRENCES (2nd+ copies; the paper's wording is ambiguous between
      this and all copies — this implementation's choice, stated);
    * ``top_word_frac`` — fraction of all words taken by the single
      most frequent (lowercased) word;

    plus per-signal booleans and ``repetition_pass``. Corpus-WIDE line
    repetition is a different operator (`dedup.line_dedup`); this one is
    per-document and shuffle-free.

    Everything is codegen. The top-word count uses sort-then-max-run:
    ``array_sort`` the words, then one ``aggregate`` pass comparing
    neighbours — O(n log n) per doc, no explode, no shuffle (the naive
    distinct×filter form is O(n·distinct) and the exploded groupBy
    costs a shuffle per corpus; stated so nobody "optimizes" it back).
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n", -1),
                     lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    n_dist_lines = F.size(F.array_distinct(lines))
    dup_lines = n_lines - n_dist_lines
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, ln: acc + F.length(ln))
    dist_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0),
        lambda acc, ln: acc + F.length(ln))
    dup_line_chars = total_line_chars - dist_line_chars
    words = F.transform(
        F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != ""),
        lambda w: F.lower(w))
    n_words = F.size(words)
    ws = F.array_sort(words)
    # max run length in the sorted array: fold (prev, run, best)
    run = F.aggregate(
        ws,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.greatest(acc["best"],
                       F.when(w == acc["prev"], acc["run"] + 1)
                        .otherwise(F.lit(1))).alias("best")))
    top_word_n = run["best"]
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    safe_chars = F.greatest(total_line_chars, F.lit(1)).cast("double")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    dlf = dup_lines.cast("double") / safe_lines
    dlcf = dup_line_chars.cast("double") / safe_chars
    twf = top_word_n.cast("double") / safe_words
    return (df
            .withColumn("dup_line_frac", dlf)
            .withColumn("dup_line_char_frac", dlcf)
            .withColumn("top_word_frac", twf)
            .withColumn("r_dup_lines", dlf <= max_dup_line_frac)
            .withColumn("r_dup_line_chars", dlcf <= max_dup_line_char_frac)
            .withColumn("r_top_word", twf <= max_top_word_frac)
            .withColumn("repetition_pass",
                        (dlf <= max_dup_line_frac)
                        & (dlcf <= max_dup_line_char_frac)
                        & (twf <= max_top_word_frac)))


def tfidf_top_terms(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5,
                    min_df: int = 1) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (the keyword-extraction
    primitive of every corpus-exploration pipeline; no reference
    analog — spandex has no text surface, SURVEY.md §1.1).

    Definitions, chosen to be SQL-oracle-replicable: tokens are
    lowercased whitespace words; tf = raw in-document count;
    idf = ln((1 + N) / (1 + df)) + 1 (the sklearn smooth form — never
    zero, no division by zero); ties break by term ascending, so the
    output is fully deterministic.

    Scale shape: explode → ONE groupBy (id, term) for tf; the per-term
    document frequency aggregates FROM that tf table (terms only, no
    second pass over text) and joins back on term — vocabulary-sized,
    AQE picks broadcast when it fits; the final top-k is one window
    over id. All JVM."""
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                        r"\s+", " ")), " "),
        lambda w: w != "")
    tf = (df.select(id_col, F.explode(toks).alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    # N stays IN-PLAN (1-row aggregate broadcast-cross-joined) — a
    # driver-side .count() here would be a whole extra corpus scan
    n_docs = df.agg(F.countDistinct(id_col).alias("_n_docs"))
    docfreq = (tf.groupBy("term")
               .agg(F.count("*").alias("df"))
               .filter(F.col("df") >= min_df))
    from pyspark.sql import Window
    scored = (tf.join(docfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("idf", F.log((1.0 + F.col("_n_docs"))
                                       / (1.0 + F.col("df"))) + 1.0)
              .withColumn("tfidf", F.col("tf") * F.col("idf")))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("tfidf").desc(), F.col("term").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "term", "tf", "df",
                    F.round("tfidf", 9).alias("tfidf")))


def readability(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade as ONE codegen
    projection (the classic corpus quality signals; Gopher and CCNet
    gate on adjacent statistics). Definitions chosen to be regex-exact
    and SQL-replicable, documented rather than dictionary-true:
    words = whitespace tokens; sentences = runs of [.!?] (floor 1);
    syllables = runs of [aeiouyAEIOUY] per word (floor 1 per word — the
    standard vowel-group approximation, no silent-e adjustment).

    Appends: n_words, n_sentences, n_syllables, flesch_ease (clamped to
    [-100, 121.22]), fk_grade. Empty/whitespace text -> NULLs."""
    t = F.col(text_col)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"([.!?]+)"), 1)), F.lit(1))
    # vowel-group runs per word, floored at 1, summed with aggregate()
    syl = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit(r"([aeiouyAEIOUY]+)"), 1)),
            F.lit(1)))
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = syl.cast("double") / n_words.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    empty = n_words == 0
    return (df
            .withColumn("n_words", F.when(~empty, n_words.cast("long")))
            .withColumn("n_sentences", F.when(~empty, n_sent.cast("long")))
            .withColumn("n_syllables", F.when(~empty, syl.cast("long")))
            .withColumn("flesch_ease", F.when(~empty, F.greatest(
                F.least(ease, F.lit(121.22)), F.lit(-100.0))))
            .withColumn("fk_grade", F.when(~empty, grade)))


def entropy_stats(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  include_chars: bool = False) -> DataFrame:
    """Shannon entropy of the per-document token distribution — the
    information-density quality axis next to gopher_rules (repetition)
    and langmodel (fluency): machine-generated spam has LOW word
    entropy (few distinct tokens dominate), encoding garbage has HIGH
    char entropy.  Tokens = lowercased whitespace words (the
    textstats.py convention, SQL-oracle-replicable).

    Output: (id_col, n_tokens, distinct_tokens, word_entropy [bits;
    0.0 for a 1-token doc, NULL for an empty/NULL doc], and with
    ``include_chars`` char_entropy over non-space characters — a
    SECOND explode+aggregate pass, off by default).

    Scale shape: explode -> ONE (id, term) count -> ONE per-id
    aggregate computing -sum(c/n * log2(c/n)); both hash aggregates
    with map-side combine.  log2(n) - sum(c*log2(c))/n is the
    numerically identical one-pass form used so the oracle can
    replicate it operand-for-operand."""
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                        r"\s+", " ")), " "),
        lambda w: w != "")

    def _entropy(unit_col: F.Column, name: str) -> DataFrame:
        tf = (df.select(id_col, F.explode(unit_col).alias("u"))
              .filter(F.col("u") != "")     # empty text splits to [""]
              .groupBy(id_col, "u").agg(F.count("*").alias("c")))
        return (tf.groupBy(id_col)
                .agg(F.sum("c").alias("n"),
                     F.count("*").alias("k"),
                     F.sum(F.col("c") * F.log2("c")).alias("_clc"))
                .select(id_col, F.col("n").alias(f"_{name}_n"),
                        F.col("k").alias(f"_{name}_k"),
                        (F.log2("n") - F.col("_clc") / F.col("n"))
                        .alias(f"{name}_entropy")))

    words = _entropy(toks, "word")
    out = (df.select(id_col)
           .join(words, id_col, "left")
           .select(id_col,
                   F.coalesce(F.col("_word_n"), F.lit(0))
                   .alias("n_tokens"),
                   F.coalesce(F.col("_word_k"), F.lit(0))
                   .alias("distinct_tokens"),
                   F.col("word_entropy")))
    if include_chars:
        chars = _entropy(
            F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                     r"\s+", ""), "(?!^)(?!$)"),
            "char")
        out = (out.join(chars.select(id_col, "char_entropy"),
                        id_col, "left"))
    return out


def c4_clean(df: DataFrame, *, text_col: str = "text",
             out_col: str = "clean_text",
             min_words_per_line: int = 5,
             min_sentences: int = 3,
             blocklist: list | None = None) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, §2.2 — the
    T5 corpus recipe, the third standard web filter next to
    `quality_score` and `gopher_rules`).  LINE rules rewrite the text;
    PAGE rules flag the document:

    line kept iff it ends in terminal punctuation (. ! ? ” "), has at
    least ``min_words_per_line`` words, and does not contain the word
    'javascript' (case-insensitive);
    page passes iff the CLEANED text has >= ``min_sentences`` terminal-
    punctuation sentences, contains no 'lorem ipsum', no '{' (code),
    and no blocklist phrase (C4 uses the public "List of Dirty, Naughty
    ..." list — supply it via ``blocklist``; default None skips the
    rule rather than shipping a word list here).

    Adds ``out_col`` (kept lines re-joined with '\\n'; NULL text stays
    NULL), per-rule booleans, and ``c4_pass``.  Pure codegen, map-only,
    zero shuffles — runs per-row over the full crawl like gopher_rules.
    """
    text = F.col(text_col)
    lines = F.split(text, r"\n", -1)
    keep = F.filter(lines, lambda ln: (
        F.trim(ln).rlike(r'[.!?"”]$')
        & (F.size(F.filter(F.split(F.trim(ln), r"\s+"),
                           lambda w: w != "")) >= min_words_per_line)
        & ~F.lower(ln).rlike(r"\bjavascript\b")))
    cleaned_expr = F.when(text.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.array_join(keep, "\n"))
    # MATERIALIZE the cleaned text before the page rules read it: each
    # rule referencing the inline expression re-runs the whole line
    # filter (the substring_dedup/dsir inlining lesson).  Measured
    # 10.1k → 12.0k docs/s (+18%) — smaller than the dedup wins
    # because here the single mandatory line-filter pass dominates
    # (3 regexes + a word split per line), not the duplicate reads
    df = df.withColumn(out_col, cleaned_expr)
    cleaned = F.col(out_col)
    low = F.lower(cleaned)
    has_sentences = (F.size(F.split(cleaned, r"[.!?]", -1)) - 1
                     >= min_sentences)
    no_lorem = ~low.contains("lorem ipsum")
    no_brace = ~cleaned.contains("{")
    if blocklist:
        bl = F.lit(True)
        for w in blocklist:
            bl = bl & ~low.rlike(r"\b" + str(w).lower() + r"\b")
        no_block = bl
    else:
        no_block = F.lit(True)
    out = (df
           .withColumn("c4_sentences", has_sentences)
           .withColumn("c4_no_lorem", no_lorem)
           .withColumn("c4_no_brace", no_brace)
           .withColumn("c4_no_blockword", no_block)
           .withColumn("c4_pass",
                       F.coalesce(has_sentences & no_lorem & no_brace
                                  & no_block, F.lit(False))))
    return out
