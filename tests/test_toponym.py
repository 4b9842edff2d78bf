"""Toponym resolution (operators/toponym.py::resolve_toponyms):
coherence-beats-population closed form (Paris with Berlin context),
single-mention population fallback, case-insensitive matching,
deterministic ties, unmatched mentions absent, and the numpy scoring
parity of the two-pass heuristic."""

import math

import pytest

from spandex_spark.operators.toponym import resolve_toponyms

# an ambiguous mini-gazetteer: two Parises, one Berlin, one Springfield
# pair with equal population (tie-break check)
GAZ = [
    ("Paris", 1, 2_100_000.0, 2.35, 48.85),       # Paris, FR
    ("Paris", 2, 25_000.0, -95.55, 33.66),        # Paris, TX
    ("Berlin", 3, 3_600_000.0, 13.40, 52.52),
    ("Springfield", 4, 117_000.0, -89.65, 39.80),  # IL
    ("Springfield", 5, 117_000.0, -93.29, 37.21),  # MO, same pop
]


def _gaz(spark):
    return spark.createDataFrame(
        GAZ, "name string, gaz_id long, population double, "
             "lon double, lat double")


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, mention string")


def test_coherence_beats_population_prior(spark):
    # doc 1 mentions paris + berlin: context lands in Europe, so even
    # though Paris-FR already wins on population, flip the populations
    # to make TEXAS the prior winner and verify coherence overrides it
    gaz = spark.createDataFrame(
        [("Paris", 1, 25_000.0, 2.35, 48.85),      # FR, small
         ("Paris", 2, 2_100_000.0, -95.55, 33.66),  # TX, big
         ("Berlin", 3, 3_600_000.0, 13.40, 52.52)],
        "name string, gaz_id long, population double, lon double, lat double")
    got = {(r.doc_id, r.mention): r.gaz_id for r in resolve_toponyms(
        _mentions(spark, [(1, "paris"), (1, "berlin")]), gaz).collect()}
    # prior pass picks Paris-TX; context = mean(TX, Berlin) sits in the
    # mid-Atlantic, ~4600 km from FR vs ~4900 km from TX — with the
    # default weights the 0.35-score distance gap beats the pop gap
    assert got[(1, "berlin")] == 3
    assert got[(1, "paris")] == 1          # coherence recovers FR


def test_single_mention_falls_back_to_population(spark):
    got = resolve_toponyms(_mentions(spark, [(7, "Paris")]),
                           _gaz(spark)).collect()
    assert len(got) == 1 and got[0].gaz_id == 1   # FR by population


def test_tie_breaks_deterministic(spark):
    a = resolve_toponyms(_mentions(spark, [(1, "springfield")]),
                         _gaz(spark)).collect()[0]
    b = resolve_toponyms(_mentions(spark, [(1, "springfield")]),
                         _gaz(spark)).collect()[0]
    assert a.gaz_id == b.gaz_id == 4       # equal pop: smaller gaz_id


def test_unmatched_mentions_absent_and_case_insensitive(spark):
    got = resolve_toponyms(
        _mentions(spark, [(1, "PARIS"), (1, "atlantis")]),
        _gaz(spark)).collect()
    assert len(got) == 1 and got[0].mention == "PARIS"


def test_score_formula_parity(spark):
    rows = [(1, "paris"), (1, "berlin")]
    got = {r.gaz_id: r.score for r in
           resolve_toponyms(_mentions(spark, rows), _gaz(spark),
                            pop_weight=0.7, dist_weight=1.3,
                            scale_km=1500.0).collect()}
    # replicate pass 1 + pass 2 in python
    maxp = max(g[2] for g in GAZ)
    prior = {"paris": GAZ[0], "berlin": GAZ[2]}   # pop winners
    clon = (prior["paris"][3] + prior["berlin"][3]) / 2
    clat = (prior["paris"][4] + prior["berlin"][4]) / 2

    def hav(lon1, lat1, lon2, lat2):
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (math.sin(dlat / 2) ** 2
             + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
             * math.sin(dlon / 2) ** 2)
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    for name, gid, pop, lon, lat in GAZ[:3]:
        exp = (0.7 * math.log10(pop + 1) / math.log10(maxp + 1)
               - 1.3 * hav(lon, lat, clon, clat) / 1500.0)
        if gid in got:
            assert got[gid] == pytest.approx(exp, abs=1e-9)


def test_validation(spark):
    with pytest.raises(ValueError):
        resolve_toponyms(_mentions(spark, [(1, "paris")]), _gaz(spark),
                         scale_km=0.0)


def test_iterations_refine_context(spark):
    # anchor + one ambiguous mention: after round 1 the context is the
    # midpoint of anchor and the (wrong) prior winner; round 2's
    # context — re-estimated from round-1 winners — must keep the
    # resolution stable (fixpoint), and iterations must validate
    got1 = resolve_toponyms(
        _mentions(spark, [(1, "paris"), (1, "berlin")]), _gaz(spark),
        iterations=1).collect()
    got3 = resolve_toponyms(
        _mentions(spark, [(1, "paris"), (1, "berlin")]), _gaz(spark),
        iterations=3).collect()
    assert sorted(r.gaz_id for r in got1) == sorted(r.gaz_id for r in got3)
    with pytest.raises(ValueError):
        resolve_toponyms(_mentions(spark, [(1, "paris")]), _gaz(spark),
                         iterations=0)
