"""End-to-end curation capstone (corpus.py::curate_and_pack): the full
recipe (C4 clean -> gopher -> exact dedup + lang/quality filters ->
substring dedup -> temperature mixing -> packing) over a constructed
corpus — survivors are exactly the expected docs, every surviving
token lands in exactly one slice, and upsampled copies pack as
distinct units."""

from pyspark.sql import functions as F

from spandex_spark.corpus import curate_and_pack

GOOD_EN = ("This is a proper english sentence with the required words.\n"
           "Here is another sentence that also has enough words in it.\n"
           "And the third sentence closes out the page very nicely.")


def _docs(spark):
    rows = [
        (1, GOOD_EN, "web"),
        (2, GOOD_EN, "web"),                       # exact duplicate: dropped
        (3, GOOD_EN.replace("third", "final"), "web"),
        (4, "le chat est sur le tapis " * 10, "web"),   # not english
        (5, "short text.", "web"),                 # fails line rule
        (6, GOOD_EN.replace("english", "curated"), "books"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")


def test_end_to_end_coverage(spark):
    out = curate_and_pack(_docs(spark), context_len=16, c4=True,
                          min_quality=0.3, min_tokens=5)
    rows = out.collect()
    surv = {r.doc_id for r in rows}
    assert surv == {1, 3, 6}            # dup, french, short all gone
    # every surviving token in exactly one slice
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.begin, r.end))
    for d, spans in per_doc.items():
        spans.sort()
        n_tok = len([w for w in GOOD_EN.split() if w])
        assert spans[0][0] == 0 and spans[-1][1] == n_tok
        for (a, b), (c, e) in zip(spans, spans[1:]):
            assert c == b               # contiguous, no overlap
    # packs are full except the last
    per_pack = {}
    for r in rows:
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + (r.end - r.begin)
    last = max(per_pack)
    assert all(v == 16 for p, v in per_pack.items() if p != last)


def test_temperature_copies_pack_distinctly(spark):
    out = curate_and_pack(_docs(spark), context_len=16, c4=True,
                          min_quality=0.3, source_col="source",
                          temperature_alpha=0.0, target_total=40)
    rows = out.collect()
    # books (1 doc) must upsample: copies > 1 present, each copy packed
    books = [(r.doc_id, r.copy) for r in rows if r.doc_id == 6]
    assert len({c for _, c in books}) >= 2
    # each (doc, copy) unit covers its full token range exactly once
    per_unit = {}
    for r in rows:
        per_unit.setdefault((r.doc_id, r.copy), []).append((r.begin, r.end))
    for spans in per_unit.values():
        spans.sort()
        for (a, b), (c, e) in zip(spans, spans[1:]):
            assert c == b


def test_substring_dedup_stage(spark):
    shared = " ".join(f"w{i}" for i in range(30))
    rows = [(1, f"First sentence is fine and long enough here. {shared}",
             "web"),
            (2, f"The second page repeats it and is the same. {shared}",
             "web")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = curate_and_pack(docs, context_len=8, substring_k=20,
                          min_quality=0.0, min_tokens=1, langs=("en",))
    text = {r.doc_id: r.text for r in
            out.select("doc_id", "text").distinct().collect()}
    assert "w0" in text[1]
    assert "w0" not in text[2]          # shared passage removed from doc 2
