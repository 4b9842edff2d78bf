"""Gale-Church alignment (operators/align.py::align_sentences):
behavioral closed forms — identity corpora align 1-1, an inserted
sentence becomes a 0-1/1-0 bead, a merged long sentence becomes a 2-1
bead, empty sides degrade to deletion beads — plus coverage (every
sentence in exactly one bead) and kernel-level DP sanity."""

import pytest

from spandex_spark.operators.align import align_sentences, _gale_church


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id long, src_text string, tgt_text string")


S1 = "The cat sat quietly on the warm mat near the door."
S2 = "A dog barked loudly at the mailman outside yesterday."
S3 = "Rain fell steadily over the quiet harbor all night."


def test_identity_aligns_one_to_one(spark):
    doc = " ".join([S1, S2, S3])
    rows = align_sentences(_pairs(spark, [(1, doc, doc)])).collect()
    assert len(rows) == 3
    for r in sorted(rows, key=lambda r: r.bead):
        assert len(r.src_sentences) == 1 and len(r.tgt_sentences) == 1
        assert r.src_sentences == r.tgt_sentences


def test_missing_sentence_merges_not_deletes(spark):
    # canonical Gale-Church behaviour: a full missing sentence is
    # absorbed into a 2-1 bead, NOT a 1-0 deletion — deletions carry
    # both a low prior AND the worst possible length cost, so the
    # published aligner almost never emits them (the paper's Table 5
    # priors make this explicit)
    src = " ".join([S1, S2, S3])
    tgt = " ".join([S1, S3])          # S2 missing on the target side
    rows = sorted(align_sentences(_pairs(spark, [(1, src, tgt)])).collect(),
                  key=lambda r: r.bead)
    shapes = [(len(r.src_sentences), len(r.tgt_sentences)) for r in rows]
    assert (2, 1) in shapes           # S2 merged into a neighbour bead
    # every src sentence appears exactly once across beads
    flat = [s for r in rows for s in r.src_sentences]
    assert flat == [S1, S2, S3]


def test_merge_becomes_two_to_one(spark):
    src = " ".join([S1, S2, S3])
    tgt = " ".join([S1[:-1] + " and " + S2.lower(), S3])   # S1+S2 merged
    rows = sorted(align_sentences(_pairs(spark, [(1, src, tgt)])).collect(),
                  key=lambda r: r.bead)
    shapes = [(len(r.src_sentences), len(r.tgt_sentences)) for r in rows]
    assert (2, 1) in shapes
    assert sum(a for a, _ in shapes) == 3 and sum(b for _, b in shapes) == 2


def test_empty_sides(spark):
    rows = align_sentences(_pairs(spark, [
        (1, S1, None), (2, None, S2), (3, None, None)])).collect()
    by = {}
    for r in rows:
        by.setdefault(r.pair_id, []).append(r)
    assert [(len(r.src_sentences), len(r.tgt_sentences))
            for r in by[1]] == [(1, 0)]
    assert [(len(r.src_sentences), len(r.tgt_sentences))
            for r in by[2]] == [(0, 1)]
    assert 3 not in by


def test_kernel_prefers_low_cost_path():
    # two equal-length sentence pairs: the 1-1/1-1 path must beat any
    # path through 2-2 or deletions (priors dominate at equal lengths)
    src = ["aaaa bbbb cccc.", "dddd eeee ffff."]
    tgt = ["AAAA BBBB CCCC.", "DDDD EEEE FFFF."]
    beads = _gale_church(src, tgt, 1.0, 6.8)
    assert [(len(a), len(b)) for a, b, _ in beads] == [(1, 1), (1, 1)]
    assert all(c >= 0 or abs(c) < 1.0 for _, _, c in beads)


def test_coverage_partition(spark):
    src = " ".join([S1, S2, S3, S1.replace("cat", "fox")])
    tgt = " ".join([S2, S3])
    rows = align_sentences(_pairs(spark, [(1, src, tgt)])).collect()
    n_src = sum(len(r.src_sentences) for r in rows)
    n_tgt = sum(len(r.tgt_sentences) for r in rows)
    assert n_src == 4 and n_tgt == 2
