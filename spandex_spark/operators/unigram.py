"""Distributed unigram-LM tokenizer training (Kudo 2018; the
SentencePiece ``--model_type=unigram`` default) and the matching
Viterbi encoder — the OTHER standard subword tokenizer next to
`bpe.train_bpe` (T5/mT5/ALBERT ship unigram vocabularies; GPT-family
ship BPE).  No reference analog (spandex has no text surface,
SURVEY.md §1.1).

Algorithm (the published shape, hard-EM variant):
1. SEED: every substring of every distinct word up to
   ``max_piece_len`` chars, weighted by word frequency; keep the
   ``seed_size`` heaviest plus ALL single characters (coverage
   guarantee).  Initial probabilities from seed counts.
2. EM ROUNDS: E-step segments every distinct word with the current
   piece log-probs by VITERBI (hard EM — the deterministic variant;
   SentencePiece's soft forward-backward differs by O(1e-3) in final
   probs and converges to the same prunes on real corpora) and counts
   freq-weighted piece usage; M-step renormalizes counts to
   probabilities.  Unused multi-char pieces drop out.
3. PRUNE: each multi-char piece's loss = usage_count × (its log-prob
   minus the log-prob of re-segmenting it WITHOUT itself); keep the
   ``shrink`` fraction with the largest loss (they'd hurt most to
   lose), never dropping single chars; repeat EM+prune until
   ``vocab_size``.

Scale shapes (the `bpe` contracts): training runs over the DISTINCT
word-frequency table — one groupBy collapses 100 TB to vocab-of-words
rows, everything after is proportional to that; the seed-substring
explode is JVM-side (nested higher-order transforms, no Python);
each E-step is ONE mapInPandas Viterti pass over the word table with
the piece log-probs shipped in the closure (model-sized, the
apply_bpe convention) plus one piece-sized count aggregate; the
piece table itself is a bounded model artifact that lives driver-side
between rounds (the train_bpe merge-list / train_ivf_centroids
precedent).  Driver sync per round is one piece-table collect — the
irreducible sequential core, same as BPE's argmax probe.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spandex_spark.operators.bpe import _word_freqs

__all__ = ["train_unigram", "apply_unigram"]

_NEG_INF = float("-inf")


def _viterbi(word: str, logp: dict, max_len: int) -> tuple[list, float]:
    """Best segmentation of ``word`` under piece log-probs — the exact
    DP every SentencePiece encoder runs: best[j] = max over i of
    best[i] + logp(word[i:j]).  Unknown single chars score the UNK
    floor so any word remains encodable."""
    n = len(word)
    best = [0.0] + [_NEG_INF] * n
    back = [0] * (n + 1)
    unk = min(logp.values()) - 10.0 if logp else -30.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == _NEG_INF:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None and j - i == 1:
                lp = unk
            if lp is None:
                continue
            s = best[i] + lp
            if s > best[j]:
                best[j], back[j] = s, i
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, best[n]


def _estep_counts(words: DataFrame, logp: dict, max_len: int) -> dict:
    """One hard-EM E-step over the distinct word-frequency table:
    freq-weighted Viterbi piece counts.  The log-prob table ships in
    the closure (model-sized); the result is piece-sized."""
    items = sorted(logp.items())

    def seg(batches):
        lp = dict(items)
        memo: dict = {}
        for pdf in batches:
            out: dict = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                ps = memo.get(w)
                if ps is None:
                    ps = memo[w] = _viterbi(w, lp, max_len)[0]
                for p in ps:
                    out[p] = out.get(p, 0) + int(f)
            yield pd.DataFrame({"piece": list(out), "n": list(out.values())})

    rows = (words.mapInPandas(seg, schema="piece string, n long")
            .groupBy("piece").agg(F.sum("n").alias("n"))
            .collect())  # collect-ok: piece-table-sized model counts (train_bpe merge-probe precedent)
    return {r["piece"]: r["n"] for r in rows}


def train_unigram(corpus: DataFrame, *, vocab_size: int,
                  text_col: str = "text", lowercase: bool = False,
                  max_piece_len: int = 8, seed_size: int | None = None,
                  em_iters: int = 2,
                  shrink: float = 0.75) -> list[tuple[str, float]]:
    """Learn a unigram-LM vocabulary of at most ``vocab_size`` pieces
    (never below the single-character alphabet).  Returns
    [(piece, log_prob)] sorted by log_prob desc then piece — a bounded
    model artifact, like `train_bpe`'s merge list."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    seed_size = seed_size or 8 * vocab_size
    words = _word_freqs(corpus, text_col, lowercase).localCheckpoint(
        eager=True)

    # ---- seed: JVM nested-transform substring explode ----------------
    # single-parameter lambdas only (dsir._joiner warning)
    L = F.least(F.length("word"), F.lit(max_piece_len))
    subs = F.flatten(F.filter(
        F.transform(F.sequence(F.lit(1), L),
                    lambda k: F.when(
                        F.length("word") >= k,
                        F.transform(F.sequence(F.lit(1),
                                               F.length("word") - k + 1),
                                    lambda i: F.col("word").substr(
                                        i, F.lit(0) + k))
                    ).otherwise(F.array().cast("array<string>"))),
        lambda a: F.size(a) > 0))
    seed_rows = (words.select(F.explode(subs).alias("piece"), "freq")
                 .groupBy("piece").agg(F.sum("freq").alias("n"))
                 .orderBy(F.col("n").desc(), "piece")
                 .limit(int(seed_size))
                 .collect())  # collect-ok: bounded seed vocabulary (model artifact)
    counts = {r["piece"]: r["n"] for r in seed_rows}
    chars = {r["c"] for r in
             words.select(F.explode(F.split("word", "")).alias("c"))
             .where(F.col("c") != "").distinct()
             .collect()}  # collect-ok: alphabet-sized character set
    for c in chars:      # coverage: rare chars cut by the seed limit
        counts.setdefault(c, 1)

    def _normalize(cnt: dict) -> dict:
        tot = sum(cnt.values())
        return {p: math.log(n / tot) for p, n in cnt.items() if n > 0}

    logp = _normalize(counts)

    # ---- EM + prune rounds -------------------------------------------
    floor = max(vocab_size, len(chars))   # never below the alphabet
    while True:
        for _ in range(em_iters):
            cnt = _estep_counts(words, logp, max_piece_len)
            for c in chars:               # coverage floor: chars never die
                cnt.setdefault(c, 1)
            logp = _normalize(cnt)
        multi = [p for p in logp if len(p) > 1]
        if len(logp) <= floor:
            break
        # loss of dropping p = usage * (logp(p) - resegment-without-p).
        # del/restore instead of copying the dict per candidate — a
        # full copy per piece is O(V²) driver time at a real
        # seed_size (review-found; the bench's vocab_size=2000 never
        # tripped it)
        losses = []
        for p in multi:
            saved = logp.pop(p)
            _, alt_lp = _viterbi(p, logp, max_piece_len)
            logp[p] = saved
            losses.append((cnt.get(p, 0) * (saved - alt_lp), p))
        losses.sort(key=lambda t: (-t[0], t[1]))
        target_multi = max(0, floor - len(chars))
        keep_multi = max(target_multi, int(len(multi) * shrink))
        if keep_multi >= len(multi):      # guarantee strict progress
            keep_multi = target_multi
        kept = {p for _, p in losses[:keep_multi]} | chars
        logp = _normalize({p: cnt.get(p, 1) for p in logp if p in kept})
    return sorted(logp.items(), key=lambda t: (-t[1], t[0]))


def apply_unigram(df: DataFrame, vocab: list[tuple[str, float]], *,
                  text_col: str = "text", lowercase: bool = False,
                  out_col: str = "pieces") -> DataFrame:
    """Viterbi-encode text with a trained unigram vocabulary (the
    standard SentencePiece encoder).  Words split JVM-side; the
    log-prob table ships in the closure; repeated words memoize per
    Arrow batch (the apply_bpe Zipf-head trick)."""
    items = sorted(vocab)
    max_len = max((len(p) for p, _ in items), default=1)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        lp = dict(items)
        memo: dict = {}

        def enc(ws):
            out = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _viterbi(w, lp, max_len)[0]
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
