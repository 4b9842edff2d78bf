"""Unigram-LM tokenizer (operators/unigram.py): Viterbi optimality vs
brute-force segmentation enumeration, planted-repetition vocabulary
closed form, size/coverage/normalization invariants, encode round-trip
(incl. OOV chars), and determinism."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.unigram import (train_unigram, apply_unigram,
                                             _viterbi)


def _brute_best(word, logp, max_len):
    """Enumerate every segmentation (split-point power set)."""
    n = len(word)
    unk = min(logp.values()) - 10.0
    best = None
    for mask in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, m in enumerate(mask) if m] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        tot = 0.0
        ok = True
        for p in pieces:
            if len(p) > max_len:
                ok = False
                break
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = unk
                else:
                    ok = False
                    break
            tot += lp
        if ok and (best is None or tot > best[1]):
            best = (pieces, tot)
    return best


def test_viterbi_matches_bruteforce():
    logp = {"a": -1.0, "b": -2.0, "c": -1.5, "ab": -2.2,
            "abc": -4.0, "bc": -2.8, "cab": -3.1}
    for w in ["abcab", "aabbc", "cabab", "xbc", "a", "ccc"]:
        got_p, got_lp = _viterbi(w, logp, max_len=3)
        exp_p, exp_lp = _brute_best(w, logp, 3)
        assert got_lp == pytest.approx(exp_lp, abs=1e-12)
        assert "".join(got_p) == w
        assert got_p == exp_p or got_lp == pytest.approx(exp_lp)


def _corpus(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_planted_repetition_survives_pruning(spark):
    # 'ab' dominates the corpus: the best multi-char piece must cover it
    corpus = _corpus(spark, ["abab abab ab abab"] * 20 + ["cd"])
    chars = {"a", "b", "c", "d"}
    vocab = train_unigram(corpus, vocab_size=len(chars) + 1,
                          max_piece_len=4)
    pieces = {p for p, _ in vocab}
    assert chars <= pieces
    multi = pieces - chars
    assert len(multi) <= 1 and multi <= {"ab", "abab"}
    assert len(multi) == 1            # the repetition is worth keeping


def test_size_coverage_and_normalization(spark):
    corpus = _corpus(spark, ["the cat sat on the mat",
                             "the dog sat on the log",
                             "cats and dogs"])
    vocab = train_unigram(corpus, vocab_size=12, max_piece_len=5)
    pieces = {p for p, _ in vocab}
    alphabet = set("thecatsonmdoglansd") - {" "}
    assert alphabet <= pieces                       # full char coverage
    assert len(vocab) <= max(12, len(alphabet))     # size respected
    s = sum(math.exp(lp) for _, lp in vocab)
    assert s == pytest.approx(1.0, abs=1e-9)


def test_apply_roundtrip_and_oov(spark):
    corpus = _corpus(spark, ["hello world hello"])
    vocab = train_unigram(corpus, vocab_size=15, max_piece_len=4)
    df = _corpus(spark, ["hello world", "hello zzz qux"])  # z,q,x,u OOV
    rows = (apply_unigram(df, vocab)
            .select("text", "pieces").collect())
    for r in rows:
        assert "".join(r.pieces) == r.text.replace(" ", "")


def test_apply_is_viterbi_optimal(spark):
    vocab = [("ab", -1.5), ("a", -2.0), ("b", -2.5), ("c", -3.0)]
    df = _corpus(spark, ["abc ab ba"])
    got = apply_unigram(df, vocab).collect()[0].pieces
    logp = dict(vocab)
    exp = []
    for w in "abc ab ba".split():
        exp += _brute_best(w, logp, 2)[0]
    assert got == exp


def test_deterministic(spark):
    corpus = _corpus(spark, ["one fish two fish red fish blue fish"])
    a = train_unigram(corpus, vocab_size=14, max_piece_len=4)
    b = train_unigram(corpus, vocab_size=14, max_piece_len=4)
    assert a == b


def test_validation(spark):
    corpus = _corpus(spark, ["x"])
    with pytest.raises(ValueError):
        train_unigram(corpus, vocab_size=0)
    with pytest.raises(ValueError):
        train_unigram(corpus, vocab_size=5, shrink=1.5)
