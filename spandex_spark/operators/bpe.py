"""Distributed BPE vocabulary training (Sennrich et al. 2016) and the
matching encoder — the tokenizer-training step of an LLM data pipeline,
run as DataFrame jobs instead of a single-machine counter.

The scale trick is twofold.  First, training runs over the DISTINCT
word-frequency table, not the corpus: one groupBy collapses 100 TB of
text to vocab-of-words rows (10^8–10^9 at web scale), and everything
after is proportional to that table.  Second, pair counts are
maintained INCREMENTALLY: each merge touches only the words that
contain the chosen pair, and the pair-count state is updated with
(new-pairs − old-pairs) deltas from exactly those words — the classic
single-node optimization, here as a delta-union + sum aggregate, so a
round's shuffle is sized by touched words, not the whole table.  A
naive recount would scan every word num_merges times (GPT-2 = 50k
merges); the delta form is what makes that count feasible.

Each round needs the argmax pair on the driver (a 1-row probe) — the
merge decision is inherently sequential, the irreducible driver sync
of BPE.  State is localCheckpoint-truncated per round (the
``dedup.duplicate_clusters`` precedent).

No reference analog (spandex has no text surface, SURVEY.md §1.1);
semantics follow the published algorithm: per-position adjacent-pair
counts, greedy highest-count merge with a deterministic tie-break
(count desc, then lexicographic pair), ``</w>`` end-of-word symbol.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EOW = "</w>"


def _word_freqs(corpus: DataFrame, text_col: str,
                lowercase: bool) -> DataFrame:
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = F.split(F.trim(F.regexp_replace(txt, r"\s+", " ")), " ")
    return (corpus
            .select(F.explode(words).alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count("*").alias("freq")))


def _adjacent_pairs(syms_col):
    """Struct(a, b) per adjacent symbol position — pure JVM."""
    n = F.size(syms_col)
    return F.zip_with(F.slice(syms_col, 1, n - 1),
                      F.slice(syms_col, 2, n - 1),
                      lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def _pair_rows(words: DataFrame, sign: int) -> DataFrame:
    return (words
            .select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                    (F.col("freq") * sign).alias("n"))
            .select("p.a", "p.b", "n"))


def train_bpe(corpus: DataFrame, *, num_merges: int,
              text_col: str = "text", lowercase: bool = False,
              min_pair_count: int = 2,
              batch: int = 1) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges; stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times.  Returns
    the merge list in rank order — bounded by num_merges, i.e. a model
    artifact, not data (hence a driver-side list, like k-means
    centroids in ``similarity.train_ivf_centroids``).

    ``batch`` is the driver-sync amortizer: each round's cost is
    dominated by fixed per-job latency (the argmax collect + the delta
    aggregate), so a 50k-merge vocab at one merge per round is
    50k × round-latency regardless of cluster size.  With batch=B the
    round takes the top candidates and greedily keeps those whose
    symbols are DISJOINT from every already-kept pair in the batch —
    non-interacting merges commute, so applying them in one pass is
    EXACTLY the sequential result for the kept set; pairs that interact
    wait for the next round.  batch=1 is canonical sequential BPE
    (pytested merge-for-merge against the published algorithm); large
    batches deviate from it only in merge ORDER globally (each round's
    ranks are count-ordered), the standard distributed-BPE trade."""
    spark = corpus.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    chars = F.split(F.col("word"), "")
    words = (_word_freqs(corpus, text_col, lowercase)
             .select("word", "freq",
                     F.concat(chars, F.array(F.lit(EOW))).alias("syms"))
             .drop("word")
             .localCheckpoint(eager=True))
    counts = (_pair_rows(words, 1)
              .groupBy("a", "b").agg(F.sum("n").alias("n"))
              .localCheckpoint(eager=True))

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        want = min(int(batch), num_merges - len(merges))
        top = (counts.filter(F.col("n") >= min_pair_count)
               .orderBy(F.col("n").desc(), "a", "b")
               .limit(4 * want).collect())  # collect-ok: top-candidates argmax probe, the sequential core of BPE
        picked: list[tuple[str, str]] = []
        used: set = set()
        for r in top:
            a, b = r["a"], r["b"]
            if want > 1 and (a in used or b in used or a + b in used):
                continue
            picked.append((a, b))
            used.update((a, b, a + b))
            if len(picked) >= want:
                break
        if not picked:
            break
        merges.extend(picked)

        pair_set = set(picked)

        def _pair_cond(a: str, b: str):
            # closure factory: a default-arg lambda would change the
            # HOF's visible arity and break ArrayExists resolution
            return F.exists(
                _adjacent_pairs(F.col("syms")),
                lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)))

        conds = [_pair_cond(a, b) for a, b in picked]
        has_pair = conds[0]
        for c in conds[1:]:
            has_pair = has_pair | c
        touched = words.filter(has_pair)
        untouched = words.filter(~has_pair)
        merged = touched.withColumn("syms",
                                    _merge_pairs_udf(pair_set)("syms"))
        deltas = _pair_rows(merged, 1).unionByName(_pair_rows(touched, -1))
        counts = (counts.unionByName(deltas)
                  .groupBy("a", "b").agg(F.sum("n").alias("n"))
                  .filter(F.col("n") > 0)
                  .localCheckpoint(eager=True))
        # coalesce: the union would otherwise DOUBLE the partition count
        # every round (2^rounds tasks by merge 10 — measured)
        words = (untouched.unionByName(merged)
                 .coalesce(nparts)
                 .localCheckpoint(eager=True))
    return merges


def _merge_pairs_udf(pairs: set):
    """One-pass left-to-right replacement of a DISJOINT pair set (the
    pairs share no symbol, so the scan is order-independent)."""
    @pandas_udf(T.ArrayType(T.StringType()))
    def _merge(col: pd.Series) -> pd.Series:
        def run(s):
            syms = list(s)
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and (syms[i], syms[i + 1]) in pairs:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out
        return col.map(run)
    return _merge


def _encode_word(word: str, rank: dict) -> list:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]], *,
              text_col: str = "text", lowercase: bool = False,
              out_col: str = "pieces") -> DataFrame:
    """Tokenize with a learned merge list: words split JVM-side, each
    encoded by iterative lowest-rank adjacent merge (the standard
    encoder; equivalent to applying merges in rank order).  The merge
    table ships in the UDF closure (model-sized); repeated words are
    memoized per Arrow batch, which captures the Zipf head without a
    distinct-word shuffle."""
    rank = {p: i for i, p in enumerate(merges)}

    @pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        memo: dict = {}

        def enc(ws):
            out = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, rank)
                out.extend(got)
            return out
        return words.map(enc)

    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = F.filter(
        F.split(F.trim(F.regexp_replace(txt, r"\s+", " ")), " "),
        lambda w: F.length(w) > 0)
    return df.withColumn(out_col, _encode(words))
