"""Interval join (operators/rangejoin.py): brute-force equality on
random inputs, overlap multiplicity, wide-interval broadcast routing
equality, left-join miss recovery, broadcast path equality, NULL
contracts, guard rails, and the no-cartesian plan shape."""

import numpy as np
import pytest

from spandex_spark.operators.rangejoin import interval_join


def _frames(spark, seed=7, n_facts=400, n_iv=60, width_lo=1.0,
            width_hi=30.0, domain=1000.0):
    rng = np.random.default_rng(seed)
    fv = rng.uniform(0.0, domain, n_facts).round(3)
    facts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(fv)], "fid long, v double")
    lo = rng.uniform(0.0, domain, n_iv).round(3)
    w = rng.uniform(width_lo, width_hi, n_iv).round(3)
    ivs = spark.createDataFrame(
        [(int(j), float(a), float(a + b)) for j, (a, b) in
         enumerate(zip(lo, w))], "iid long, lo double, hi double")
    return facts, ivs, fv, lo, lo + w


def _brute(fv, lo, hi):
    pairs = set()
    for i, v in enumerate(fv):
        for j in range(len(lo)):
            if lo[j] <= v <= hi[j]:
                pairs.add((i, j))
    return pairs


def _pairs(df):
    return {(r.fid, r.iid) for r in df.select("fid", "iid").collect()}


def test_matches_brute_force(spark):
    facts, ivs, fv, lo, hi = _frames(spark)
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        bin_size=10.0)
    assert _pairs(out) == _brute(fv, lo, hi)


def test_bin_size_invariance_and_derivation(spark):
    facts, ivs, fv, lo, hi = _frames(spark, seed=11)
    expect = _brute(fv, lo, hi)
    for bs in (0.5, 3.0, 250.0, None):   # None = median-width derivation
        out = interval_join(facts, ivs, value_col="v", lo_col="lo",
                            hi_col="hi", bin_size=bs)
        assert _pairs(out) == expect, f"bin_size={bs}"


def test_overlapping_intervals_emit_all_pairs(spark):
    facts = spark.createDataFrame([(1, 5.0)], "fid long, v double")
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 4.0, 6.0), (12, 5.0, 5.0), (13, 6.0, 9.0)],
        "iid long, lo double, hi double")
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        bin_size=2.0)
    assert _pairs(out) == {(1, 10), (1, 11), (1, 12)}   # inclusive ends


def test_wide_interval_broadcast_branch_equality(spark):
    facts, ivs, fv, lo, hi = _frames(spark, seed=13)
    # add two domain-spanning outliers that would explode to ~1000 bins
    extra = spark.createDataFrame([(900, 0.0, 999.0), (901, 10.0, 800.0)],
                                  "iid long, lo double, hi double")
    ivs2 = ivs.unionByName(extra)
    tight = interval_join(facts, ivs2, value_col="v", lo_col="lo",
                          hi_col="hi", bin_size=1.0, wide_bins_cap=8)
    loose = interval_join(facts, ivs2, value_col="v", lo_col="lo",
                          hi_col="hi", bin_size=1.0, wide_bins_cap=10_000)
    assert _pairs(tight) == _pairs(loose)
    lo2 = np.append(lo, [0.0, 10.0])
    hi2 = np.append(hi, [999.0, 800.0])
    expect = {(i, 900 if j == len(lo) else 901 if j == len(lo) + 1 else j)
              for i, j in _brute(fv, lo2, hi2)}
    assert _pairs(tight) == expect


def test_left_join_recovers_misses_null_padded(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, None)], "fid long, v double")
    ivs = spark.createDataFrame([(10, 0.0, 10.0)],
                                "iid long, lo double, hi double")
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        how="left", fact_id_col="fid", bin_size=5.0)
    rows = {r.fid: (r.iid, r.lo, r.hi) for r in out.collect()}
    assert rows == {1: (10, 0.0, 10.0), 2: (None, None, None),
                    3: (None, None, None)}
    assert out.count() == 3


def test_broadcast_intervals_path_equality(spark):
    facts, ivs, fv, lo, hi = _frames(spark, seed=17)
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        broadcast_intervals=True)
    assert _pairs(out) == _brute(fv, lo, hi)


def test_integer_typed_ranges_geoip_shape(spark):
    # IPv4-as-uint32 flavored: integer value and integer [lo, hi] blocks
    facts = spark.createDataFrame(
        [(i, 16_000_000 + i * 1_000_003 % 50_000_000) for i in range(200)],
        "fid long, v long")
    ivs = spark.createDataFrame(
        [(j, j * 500_000, j * 500_000 + 499_999) for j in range(120)],
        "iid long, lo long, hi long")
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        bin_size=500_000.0)
    got = {(r.fid, r.iid) for r in out.collect()}
    fv = [16_000_000 + i * 1_000_003 % 50_000_000 for i in range(200)]
    expect = {(i, v // 500_000) for i, v in enumerate(fv)
              if v // 500_000 < 120}
    assert got == expect


def test_guard_rails(spark):
    facts = spark.createDataFrame([(1, 5.0)], "fid long, v double")
    ivs = spark.createDataFrame([(10, 0.0, 10.0)],
                                "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="how must be"):
        interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                      how="full")
    with pytest.raises(ValueError, match="fact_id_col"):
        interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                      how="left")
    with pytest.raises(ValueError, match="collision"):
        interval_join(facts.withColumnRenamed("fid", "iid"), ivs,
                      value_col="v", lo_col="lo", hi_col="hi")


def test_plan_has_no_cartesian_on_binned_branch(spark):
    facts, ivs, _, _, _ = _frames(spark)
    out = interval_join(facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
                        bin_size=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the narrow branch must be a real equi-join on _bin; the only
    # nested-loop allowed is the (empty-here) broadcast wide branch
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan)
