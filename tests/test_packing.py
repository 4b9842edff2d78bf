"""Sequence packing (operators/packing.py): chunk-mode exact-coverage
invariants (every token position once, every pack full except the
last, per-doc slices contiguous over consecutive packs), FFD no-split
guarantees (sum <= L, one pack per doc, oversize raises), determinism,
and the no-Python plan shape of the chunk path."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.packing import pack_chunks, pack_ffd


def _docs(spark, lens, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, n) for i, n in enumerate(lens)],
        "doc_id long, n_tokens long")


def test_chunks_exact_coverage(spark):
    lens = [7, 13, 1, 25, 4, 9, 30, 2, 2, 17]
    L = 10
    rows = pack_chunks(_docs(spark, lens), context_len=L,
                       buckets=4).collect()
    # every doc's slices reconstruct [0, n) contiguously
    by_doc = {}
    for r in rows:
        assert 0 <= r.begin < r.end <= lens[r.doc_id]
        by_doc.setdefault(r.doc_id, []).append((r.pack_id, r.begin, r.end))
    assert set(by_doc) == set(range(len(lens)))
    for d, pieces in by_doc.items():
        pieces.sort()
        assert pieces[0][1] == 0 and pieces[-1][2] == lens[d]
        for (p1, _, e1), (p2, b2, _) in zip(pieces, pieces[1:]):
            assert p2 == p1 + 1 and b2 == e1   # consecutive packs, contiguous
    # every pack holds exactly L tokens except the single last pack
    per_pack = {}
    for r in rows:
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + (r.end - r.begin)
    total = sum(lens)
    assert set(per_pack) == set(range((total + L - 1) // L))
    last = max(per_pack)
    for p, n in per_pack.items():
        assert n == (L if p < last else total - last * L)


def test_chunks_deterministic_and_seeded(spark):
    d = _docs(spark, [5, 6, 7, 8, 9])
    a = sorted(map(tuple, pack_chunks(d, context_len=4).collect()))
    b = sorted(map(tuple, pack_chunks(d, context_len=4).collect()))
    assert a == b
    c = sorted(map(tuple, pack_chunks(d, context_len=4, seed=7).collect()))
    assert a != c          # seed changes the concat order


def test_chunks_no_python_in_plan(spark):
    out = pack_chunks(_docs(spark, [5, 6]), context_len=4, buckets=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
               "FlatMapGroupsInPandas"):
        assert op not in plan


def test_ffd_no_split_invariants(spark):
    lens = [9, 8, 7, 2, 2, 2, 1, 5, 5, 3]
    L = 10
    rows = pack_ffd(_docs(spark, lens), context_len=L, buckets=3).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(lens)))
    per_pack = {}
    for r in rows:
        assert r.n_tokens == lens[r.doc_id]
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + r.n_tokens
    assert all(v <= L for v in per_pack.values())


def test_ffd_single_bucket_matches_reference_ffd(spark):
    lens = [9, 8, 7, 2, 2, 2, 1, 5, 5, 3]
    L = 10
    rows = pack_ffd(_docs(spark, lens), context_len=L, buckets=1).collect()
    n_packs = len({r.pack_id for r in rows})
    # reference FFD on the same (n desc, id asc) order
    order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    rooms = []
    for i in order:
        for j in range(len(rooms)):
            if rooms[j] >= lens[i]:
                rooms[j] -= lens[i]
                break
        else:
            rooms.append(L - lens[i])
    assert n_packs == len(rooms)


def test_ffd_oversize_doc_raises(spark):
    with pytest.raises(Exception, match="longer than context_len"):
        pack_ffd(_docs(spark, [5, 99]), context_len=10).collect()


def test_zero_length_docs_dropped(spark):
    d = _docs(spark, [0, 5])
    assert {r.doc_id for r in
            pack_chunks(d, context_len=4).collect()} == {1}
    assert {r.doc_id for r in
            pack_ffd(d, context_len=8).collect()} == {1}


def test_chunks_slices_apply_to_token_arrays(spark):
    # end-to-end: join the slice table back to real token arrays and
    # verify pack reconstruction equals the concatenated stream
    lens = [3, 5, 2, 7]
    docs = spark.createDataFrame(
        [(i, [f"d{i}t{j}" for j in range(n)]) for i, n in enumerate(lens)],
        "doc_id long, toks array<string>")
    sl = pack_chunks(docs.select("doc_id", F.size("toks").alias("n_tokens")),
                     context_len=4, buckets=2)
    joined = (sl.join(docs, "doc_id")
              .select("pack_id", "doc_id", "begin",
                      F.slice(F.col("toks"), F.col("begin") + 1,
                              F.col("end") - F.col("begin")).alias("piece")))
    packs = {}
    for r in joined.collect():
        packs.setdefault(r.pack_id, []).append((r.doc_id, r.begin, r.piece))
    toks_in_packs = []
    for p in sorted(packs):
        pieces = sorted(packs[p], key=lambda t: (t[0], t[1]))
        n = sum(len(x[2]) for x in pieces)
        assert n == 4 or p == max(packs)
        toks_in_packs += [t for x in pieces for t in x[2]]
    assert sorted(toks_in_packs) == sorted(
        f"d{i}t{j}" for i, n in enumerate(lens) for j in range(n))
