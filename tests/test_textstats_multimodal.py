"""Text-analysis + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.textstats import (
    token_count, bpe_piece_count, quality_score, lang_id, fingerprint)
from spandex_spark.operators.multimodal import (
    synthesize_media, extract_features, sample_frames, FEATURE_DIM)


def _df(spark):
    rows = [
        (0, "the cat and the dog sat in the house"),
        (1, "el perro y el gato que corre los dias"),
        (2, "der hund und die katze ist das haus"),
        (3, ""),
        (4, "x!!!???..."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestTextStats:
    def test_token_count(self, spark):
        out = {r.doc_id: r.n_tokens for r in token_count(_df(spark)).collect()}
        assert out[0] == 9 and out[3] == 0 and out[4] == 1

    def test_bpe_pieces_more_than_words(self, spark):
        out = {r.doc_id: r.n_pieces for r in bpe_piece_count(_df(spark)).collect()}
        assert out[4] == 10  # 'x' + 9 punctuation singles
        assert out[0] == 9

    def test_quality(self, spark):
        out = {r.doc_id: r for r in quality_score(_df(spark)).collect()}
        assert out[0].quality > out[4].quality
        assert out[0].stop_ratio > 0.3           # 'the'/'and'/'in' hits
        assert out[4].punct_ratio > 0.8

    def test_lang_id(self, spark):
        out = {r.doc_id: r.lang_pred for r in lang_id(_df(spark)).collect()}
        assert out[0] == "en" and out[1] == "es" and out[2] == "de"
        assert out[3] == "und"

    def test_fingerprint_normalizes_whitespace(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello  World"), (1, "hello world"), (2, "hello  world ")],
            ["doc_id", "text"])
        out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
        assert out[0] == out[1] == out[2]


class TestMultimodal:
    def test_feature_extraction_deterministic(self, spark):
        media = synthesize_media(spark, n=30)
        out = extract_features(media).collect()
        assert len(out) == 30
        for r in out:
            assert len(r.features) == FEATURE_DIM
            assert r.n_bytes > 0 and len(r.digest) == 16
        # deterministic: second run identical
        out2 = extract_features(synthesize_media(spark, n=30)).collect()
        a = {r.media_id: (r.digest, tuple(r.features)) for r in out}
        b = {r.media_id: (r.digest, tuple(r.features)) for r in out2}
        assert a == b

    def test_real_decode_is_marked_stub(self, spark):
        media = synthesize_media(spark, n=3)
        with pytest.raises(Exception):  # NotImplementedError inside the UDF
            extract_features(media, decode_stub=False).collect()

    def test_frame_sampling_fanout(self, spark):
        media = synthesize_media(spark, n=30)
        frames = sample_frames(media, every_ms=1000).collect()
        vids = media.filter(F.col("kind") == "video").collect()
        want = sum(max(v.duration_ms, 1) // 1000 + (1 if v.duration_ms % 1000 else 0)
                   for v in vids)
        assert len(frames) == sum(
            len(range(0, max(v.duration_ms, 1), 1000)) for v in vids)
        assert all(len(f.frame_digest) == 16 for f in frames)


class TestCorpusSelect:
    def test_invariants_and_single_shuffle(self, spark):
        from spandex_spark.corpus import corpus_select
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = corpus_select(docs, langs=("en", "fr"), min_quality=0.45,
                            min_tokens=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        # the dedup window is the pipeline's ONLY shuffle
        assert len(re.findall(r"Exchange (?:hash|range)partitioning",
                              plan)) == 1
        rows = out.collect()
        assert rows
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids))
        for r in rows:
            assert r.lang_pred in ("en", "fr")
            assert r.quality >= 0.45 and r.n_tokens >= 5
        # constructed duplicates: re-adding every text under higher ids
        # must not change the selection at all (min-id canonical wins)
        dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
        out2 = corpus_select(docs.unionByName(dup), langs=("en", "fr"),
                             min_quality=0.45, min_tokens=5)
        assert sorted(ids) == sorted(r.doc_id for r in out2.collect())
