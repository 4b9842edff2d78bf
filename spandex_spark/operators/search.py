"""BM25 full-text relevance ranking over a document corpus.

Reference semantics: Okapi BM25 (Robertson et al., TREC-3), in the
Lucene/Elasticsearch parameterization — THE default relevance score of
every text search engine, and the standard retrieval arm of
training-data curation (rank a web corpus against a topic query, keep
the head — the "importance resampling" shape of DSIR and friends).
No reference analog (spandex has no text surface, SURVEY.md §1.1).

Definitions (all SQL-oracle-replicable, textstats.py conventions):
tokens = lowercased whitespace words; tf = raw count of the term in
the doc; dl = doc token count; avgdl = corpus mean dl;
idf_t = ln(1 + (N - df_t + 0.5)/(df_t + 0.5))   [Lucene's >= 0 form]
score(d, q) = sum_t idf_t * tf / (tf + k1 * (1 - b + b * dl/avgdl)).

Spark realization — pure JVM, and the query never touches the full
vocabulary: documents explode to (id, term) ONLY for terms in the
query set (an array_contains prune BEFORE the explode, so non-matching
docs contribute zero exploded rows); document frequency and N/avgdl
are term-count-sized and 1-row aggregates broadcast back in-plan
(the tfidf_top_terms pattern).  ONE data-sized shuffle: the (id, term)
tf groupBy.  Docs matching no term are absent from the output —
filtering them is the point of ranking.

Scale shape at 100 TB: the exploded stream is (matched terms per doc)
rows, not (all tokens); everything else is vocabulary- or
constant-sized.  Top-k is an optional TakeOrdered, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_rank"]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                        r"\s+", " ")), " "),
        lambda w: w != "")


def bm25_rank(docs: DataFrame, query: list[str], *,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              top_k: int | None = None) -> DataFrame:
    """Score every document against `query` (a bag of terms — duplicate
    query terms are deduplicated, per Lucene).  Output:
    (id_col, score, n_matched) for documents matching >= 1 term,
    descending-score/ascending-id ordered when `top_k` is given.
    Scores round to 9 decimals for cross-engine hash stability
    (tfidf_top_terms convention)."""
    terms = sorted({t.lower() for t in query if t and t.strip()})
    if not terms:
        raise ValueError("query must contain at least one term")
    qlit = F.array(*[F.lit(t) for t in terms])
    toks = _tokens(text_col).alias("_toks")
    base = docs.select(F.col(id_col), toks)
    # corpus stats over ALL docs (dl includes docs that match nothing)
    stats = base.agg(F.count(F.lit(1)).alias("_n"),
                     F.avg(F.size("_toks")).alias("_avgdl"))
    # prune before exploding: only query terms survive
    matched = base.select(
        id_col, F.size("_toks").alias("dl"),
        F.explode(F.array_intersect(qlit, "_toks")).alias("term"),
        "_toks")
    tf = (matched.select(
            id_col, "dl", "term",
            F.size(F.filter("_toks",
                            lambda w: w == F.col("term"))).alias("tf")))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(docfreq), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0)
                + (F.col("_n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    part = idf * F.col("tf") / (
        F.col("tf") + F.lit(float(k1))
        * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl")
           / F.col("_avgdl")))
    out = (scored.groupBy(id_col)
           .agg(F.round(F.sum(part), 9).alias("score"),
                F.count(F.lit(1)).alias("n_matched")))
    if top_k is not None:
        out = out.orderBy(F.col("score").desc(),
                          F.col(id_col).asc()).limit(top_k)
    return out
