"""Distributed BPE training (operators/bpe.py) against an in-test
pure-Python reference of the published algorithm (same tie-break:
count desc, then lexicographic pair), plus encoder round-trips."""

import collections

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.bpe import EOW, apply_bpe, train_bpe


def _ref_train(word_freqs, num_merges, min_pair_count=2):
    words = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        stats = collections.Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def _ref_encode(word, merges):
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cand = [(rank[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in rank]
        if not cand:
            break
        _, i = min(cand)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


SENNRICH = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()


def _freqs(text):
    return collections.Counter(text.split())


def test_merges_match_reference_sennrich_corpus(spark):
    df = spark.createDataFrame([(1, SENNRICH)], "doc_id long, text string")
    got = train_bpe(df, num_merges=10, min_pair_count=2)
    want = _ref_train(_freqs(SENNRICH), 10)
    assert got == want
    # sanity on the classic example: ('e','s') is the first merge
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_merges_match_reference_multidoc(spark):
    docs = ["the cat sat on the mat",
            "the dog sat on the log",
            "cats and dogs and cats",
            "the the the thesis theme"]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = train_bpe(df, num_merges=25, min_pair_count=2)
    want = _ref_train(_freqs(" ".join(docs)), 25)
    assert got == want


def test_early_stop_on_min_count(spark):
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    got = train_bpe(df, num_merges=50, min_pair_count=2)
    want = _ref_train(_freqs("ab ab cd"), 50)
    assert got == want
    assert len(got) < 50  # exhausted pairs >= 2 well before the budget


def test_encoder_matches_reference_and_roundtrips(spark):
    train = spark.createDataFrame([(1, SENNRICH)], "doc_id long, text string")
    merges = train_bpe(train, num_merges=8)
    probe = ["lowest newer widest", "low low slowest", "unseen"]
    df = spark.createDataFrame(list(enumerate(probe)),
                               "doc_id long, text string")
    out = {r["doc_id"]: r["pieces"]
           for r in apply_bpe(df, merges).collect()}
    for i, text in enumerate(probe):
        want = []
        for w in text.split():
            want.extend(_ref_encode(w, merges))
        assert out[i] == want, (i, out[i], want)
        # byte fidelity: pieces concat (marker stripped) == input words
        joined = "".join(out[i]).replace(EOW, " ").strip()
        assert joined == " ".join(text.split())


def test_encoder_whitespace_and_empty(spark):
    merges = [("a", "b")]
    df = spark.createDataFrame([(1, "  ab \t ab\n"), (2, ""), (3, "   ")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["pieces"] for r in apply_bpe(df, merges).collect()}
    assert out[1] == ["ab", EOW, "ab", EOW]
    assert out[2] == [] and out[3] == []


def test_batched_merges_valid_and_faster_schedule(spark):
    docs = ["the cat sat on the mat", "the dog sat on the log",
            "cats and dogs and cats", "the the the thesis theme"]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    seq = train_bpe(df, num_merges=16, min_pair_count=2)
    bat = train_bpe(df, num_merges=16, min_pair_count=2, batch=4)
    # the batched schedule's first pick each round is count-optimal, so
    # the canonical first merge leads both lists; the tail may reorder
    # (documented trade) but the encoder must still round-trip bytes
    assert bat[0] == seq[0]
    assert 8 <= len(bat) <= 16
    out = apply_bpe(df, bat).collect()
    for r in out:
        text = docs[r["doc_id"]]
        joined = "".join(r["pieces"]).replace(EOW, " ").strip()
        assert joined == " ".join(text.split())


def test_lowercase_option(spark):
    df = spark.createDataFrame([(1, "AB ab Ab aB")], "doc_id long, text string")
    got = train_bpe(df, num_merges=3, lowercase=True)
    want = _ref_train(_freqs("ab ab ab ab"), 3)
    assert got == want
