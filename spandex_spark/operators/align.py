"""Gale–Church sentence alignment (Computational Linguistics 1993) —
the classic length-based aligner that turns document-level translation
pairs (e.g. `bitext.mine_bitext` output joined back to text) into
SENTENCE-level beads for MT training.  Character lengths alone carry
the signal: the per-character expansion ratio between languages is
near-constant (c=1, s²=6.8 in the paper; overridable), so a dynamic
program over the two sentence lists with bead types 1-1, 1-0, 0-1,
2-1, 1-2, 2-2 and the published priors recovers the alignment without
any lexical resources.

Spark realization: sentence splitting is JVM regexp; the O(n·m) DP runs
per document pair inside ONE ``applyInPandas`` group pass (document
pairs are the natural parallel unit; n, m are sentences-per-document,
bounded).  Output: one row per bead —
(pair_id, bead, src_sentences array, tgt_sentences array, cost).

The DP is the published recurrence: D(i,j) = min over bead types of
D(i',j') + cost(bead), cost = −log prior(bead) − log P(δ) with
δ = (l_tgt − l_src·c) / sqrt(l_src·s2) and P(δ) = 2(1 − Φ(|δ|)).
Priors (paper, Table 5): 1-1 .89, 1-0/0-1 .0099 each, 2-1/1-2 .089/2
each, 2-2 .011.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["align_sentences", "split_sentences"]

_PRIORS = {(1, 1): 0.89, (1, 0): 0.0099, (0, 1): 0.0099,
           (2, 1): 0.0445, (1, 2): 0.0445, (2, 2): 0.011}


def split_sentences(col):
    """Terminal-punctuation sentence split as a Column — the same
    regexp contract as textstats.c4_clean's sentence counting."""
    return F.filter(
        F.transform(F.split(col, r"(?<=[.!?])\s+"), lambda s: F.trim(s)),
        lambda s: s != "")


def _match_cost(l1: int, l2: int, c: float, s2: float) -> float:
    if l1 == 0 and l2 == 0:
        return 0.0
    mean = (l1 + l2 / c) / 2.0
    if mean <= 0:
        return 25.0
    delta = (l2 - l1 * c) / math.sqrt(mean * s2)
    # two-sided tail of the standard normal via erf
    p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(delta) / math.sqrt(2.0))))
    return -math.log(p) if p > 1e-300 else 700.0


def _gale_church(src: list, tgt: list, c: float, s2: float):
    n, m = len(src), len(tgt)
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    B = [[None] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            if D[i][j] == INF:
                continue
            for (a, b), prior in _PRIORS.items():
                ii, jj = i + a, j + b
                if ii > n or jj > m:
                    continue
                l1 = sum(len(s) for s in src[i:ii])
                l2 = sum(len(s) for s in tgt[j:jj])
                cost = (D[i][j] - math.log(prior)
                        + _match_cost(l1, l2, c, s2))
                if cost < D[ii][jj]:
                    D[ii][jj] = cost
                    B[ii][jj] = (i, j)
    beads = []
    i, j = n, m
    while (i, j) != (0, 0):
        pi, pj = B[i][j]
        beads.append((src[pi:i], tgt[pj:j],
                      D[i][j] - D[pi][pj]))
        i, j = pi, pj
    beads.reverse()
    return beads


def align_sentences(pairs: DataFrame, *, pair_id_col: str = "pair_id",
                    src_col: str = "src_text", tgt_col: str = "tgt_text",
                    c: float = 1.0, s2: float = 6.8) -> DataFrame:
    """One row per alignment bead:
    (pair_id, bead, src_sentences, tgt_sentences, cost).  Empty or
    NULL documents on either side align everything to 0-1/1-0 beads;
    a pair with both sides empty emits nothing.

    CONTRACT: ``pair_id_col`` values must be unique — duplicate pair_id
    rows land in one group and each restarts bead numbering at 0,
    emitting colliding (pair_id, bead) keys. Deduplicate or re-key
    upstream (ADVICE r5)."""
    base = pairs.select(
        F.col(pair_id_col).alias("_pid"),
        split_sentences(F.coalesce(F.col(src_col), F.lit("")))
        .alias("_src"),
        split_sentences(F.coalesce(F.col(tgt_col), F.lit("")))
        .alias("_tgt"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"_pid": [], "bead": [], "src_sentences": [],
               "tgt_sentences": [], "cost": []}
        for pid, src, tgt in zip(pdf["_pid"], pdf["_src"], pdf["_tgt"]):
            src, tgt = list(src), list(tgt)
            if not src and not tgt:
                continue
            for k, (a, b, cost) in enumerate(
                    _gale_church(src, tgt, c, s2)):
                out["_pid"].append(pid)
                out["bead"].append(k)
                out["src_sentences"].append(a)
                out["tgt_sentences"].append(b)
                out["cost"].append(float(cost))
        # explicit dtypes: an all-empty group otherwise builds float64
        # columns, which Arrow cannot convert to list<string>
        return pd.DataFrame({
            "_pid": pd.Series(out["_pid"], dtype="int64"),
            "bead": pd.Series(out["bead"], dtype="int32"),
            "src_sentences": pd.Series(out["src_sentences"], dtype=object),
            "tgt_sentences": pd.Series(out["tgt_sentences"], dtype=object),
            "cost": pd.Series(out["cost"], dtype="float64")})

    schema = ("_pid long, bead int, src_sentences array<string>, "
              "tgt_sentences array<string>, cost double")
    return (base.groupBy("_pid").applyInPandas(
        lambda key, pdf: run(pdf), schema)
        .withColumnRenamed("_pid", pair_id_col))
