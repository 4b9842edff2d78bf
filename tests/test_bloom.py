"""Distributed Bloom filter (operators/bloom.py): zero false
negatives by construction, measured false-positive rate near theory,
deterministic bitmap, frontier filtering semantics."""

import math

import pytest
from pyspark.sql import functions as F

from spandex_spark.operators.bloom import (
    bloom_build, bloom_params, bloom_probe, bloom_unseen)


def _urls(spark, lo, hi, tag="a"):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    F.concat(F.lit(f"https://host-{tag}.example/p/"),
                             F.col("id")).alias("url")))


@pytest.fixture(scope="module")
def built(spark):
    m, k = bloom_params(500, 0.01)
    seen = _urls(spark, 0, 500)
    bloom = bloom_build(seen, "url", m_bits=m, k=k).cache()
    bloom.count()  # materialize once for the probes below
    return m, k, bloom


def test_params_math():
    m, k = bloom_params(1000, 0.01)
    assert m == math.ceil(-1000 * math.log(0.01) / math.log(2) ** 2)
    assert k == round(m / 1000 * math.log(2))
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives(spark, built):
    m, k, bloom = built
    res = bloom_probe(_urls(spark, 0, 500), "url", bloom,
                      id_col="id", m_bits=m, k=k)
    assert res.count() == 500
    assert res.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_near_theory(spark, built):
    m, k, bloom = built
    fresh = _urls(spark, 10_000, 14_000, tag="b")
    res = bloom_probe(fresh, "url", bloom, id_col="id", m_bits=m, k=k)
    fp = res.filter(F.col("maybe_seen")).count() / 4_000
    assert fp < 0.03, fp  # sized for 1%; 3x headroom over theory


def test_unseen_filter_semantics(spark, built):
    m, k, bloom = built
    mixed = _urls(spark, 400, 600)  # 100 seen + 100 new
    out = bloom_unseen(mixed, "url", bloom, id_col="id", m_bits=m, k=k)
    ids = {r["id"] for r in out.collect()}
    assert not any(i < 500 for i in ids)      # no seen url readmitted
    assert len(ids) > 90                      # ~1% of new dropped at most


def test_deterministic_and_shuffle_join_parity(spark, built):
    m, k, bloom = built
    again = bloom_build(_urls(spark, 0, 500), "url", m_bits=m, k=k)
    a = sorted((r["word_idx"], r["bits"]) for r in bloom.collect())
    b = sorted((r["word_idx"], r["bits"]) for r in again.collect())
    assert a == b
    bc = bloom_probe(_urls(spark, 450, 520), "url", bloom,
                     id_col="id", m_bits=m, k=k, broadcast_filter=True)
    sh = bloom_probe(_urls(spark, 450, 520), "url", bloom,
                     id_col="id", m_bits=m, k=k, broadcast_filter=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


def test_sharded_build(spark):
    m, k = bloom_params(200, 0.01)
    df = (_urls(spark, 0, 200)
          .withColumn("shard", (F.col("id") % 2).cast("int")))
    bloom = bloom_build(df, "url", m_bits=m, k=k,
                        extra_group_cols=("shard",))
    assert bloom.select("shard").distinct().count() == 2
    # each shard is an independent bitmap: probing shard 0's bitmap
    # with shard 1's keys behaves like fresh keys (some misses certain)
    b0 = bloom.filter(F.col("shard") == 0).drop("shard")
    odd = _urls(spark, 0, 200).filter(F.col("id") % 2 == 1)
    res = bloom_probe(odd, "url", b0, id_col="id", m_bits=m, k=k)
    assert res.filter(~F.col("maybe_seen")).count() > 80


def test_sharded_filter_probes_as_union(spark):
    # review regression: probing a multi-shard filter must bit_or-merge
    # shards (union semantics) - never readmit a seen key
    m, k = bloom_params(400, 0.01)
    df = (_urls(spark, 0, 400)
          .withColumn("shard", (F.col("id") % 4).cast("int")))
    bloom = bloom_build(df, "url", m_bits=m, k=k,
                        extra_group_cols=("shard",)).drop("shard")
    res = bloom_probe(_urls(spark, 0, 400), "url", bloom,
                      id_col="id", m_bits=m, k=k)
    assert res.filter(~F.col("maybe_seen")).count() == 0
