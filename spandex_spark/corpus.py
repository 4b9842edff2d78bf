"""Training-corpus selection pipeline — the composition showpiece for the
LLM-data side of the engine: exact dedup → language ID → quality scoring →
token accounting → filter, all pure JVM column programs (operators/
textstats.py + operators/dedup.py), so the WHOLE pipeline stays inside
whole-stage codegen with exactly ONE shuffle (the dedup window on the
content digest).

This is the deterministic core of a web-corpus curation job; the
probabilistic stages (MinHash/SimHash near-dup, ANN) hang off the same
DataFrame between steps 1 and 2 (see operators/dedup.py::minhash_lsh_pairs
and ::duplicate_clusters for the near-dup variant of step 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spandex_spark.operators.textstats import (lang_id, quality_score,
                                               token_count)


def corpus_select(documents: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", langs: tuple[str, ...] = ("en",),
                  min_quality: float = 0.5,
                  min_tokens: int = 5) -> DataFrame:
    """Select the train-ready subset of a document table.

    1. EXACT DEDUP — keep the minimum-id document per content digest
       (one window over sha2(text): the pipeline's only shuffle);
    2. LANG FILTER — stopword-marker language ID in ``langs``;
    3. QUALITY FILTER — composite score >= ``min_quality``;
    4. LENGTH FLOOR — whitespace tokens >= ``min_tokens``.

    Returns (id_col, lang_pred, n_tokens, quality) for the surviving docs.
    Fully SQL-oracle-able: every stage is deterministic JVM arithmetic.
    """
    w = Window.partitionBy("_sha")
    canon = (documents
             .withColumn("_sha", F.sha2(F.col(text_col), 256))
             .withColumn("_canon", F.min(id_col).over(w))
             .filter(F.col(id_col) == F.col("_canon"))
             .drop("_sha", "_canon"))
    scored = token_count(quality_score(lang_id(canon, text_col=text_col),
                                       text_col=text_col), text_col=text_col)
    return (scored
            .filter(F.col("lang_pred").isin(*langs)
                    & (F.col("quality") >= F.lit(float(min_quality)))
                    & (F.col("n_tokens") >= F.lit(int(min_tokens))))
            .select(id_col, "lang_pred", "n_tokens",
                    (F.round("quality", 6) + 0.0).alias("quality")))


def curate_and_pack(documents: DataFrame, *, context_len: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    source_col: str | None = None,
                    langs: tuple[str, ...] = ("en",),
                    min_quality: float = 0.5, min_tokens: int = 5,
                    c4: bool = False, gopher: bool = False,
                    substring_k: int | None = None,
                    temperature_alpha: float | None = None,
                    target_total: int | None = None,
                    seed: int = 42) -> DataFrame:
    """The full modern curation recipe as ONE composition — the order
    every published pipeline (C4, Gopher/MassiveText, RefinedWeb,
    Dolma) converges on: cheap per-row filters first, corpus-wide
    dedup second, mixing third, packing last.

    1. optional C4 line/page cleaning (`textstats.c4_clean` rewrites
       ``text_col`` in place) and Gopher document rules;
    2. `corpus_select` (exact dedup + lang/quality/length, ONE
       shuffle) — the survivors keep their cleaned text;
    3. optional corpus-wide exact-substring span dedup
       (`dedup.substring_dedup` at ``substring_k``);
    4. optional temperature source mixing
       (`sampling.temperature_resample` at ``temperature_alpha``
       toward ``target_total`` docs; requires ``source_col``);
    5. concat-and-chunk packing (`packing.pack_chunks`) into
       ``context_len``-token slices.

    Output: the pack slice table (pack_id, id, begin, end) JOINED back
    to the surviving text — (pack_id, <id_col>, copy, begin, end,
    <text_col>) — ready for a trainer to slice.  Every stage is the
    already-tested operator; this function adds ordering and column
    plumbing only (pytested end-to-end: every surviving token lands in
    exactly one slice).
    """
    from spandex_spark.operators.dedup import substring_dedup
    from spandex_spark.operators.packing import pack_chunks
    from spandex_spark.operators.sampling import temperature_resample
    from spandex_spark.operators.textstats import c4_clean, gopher_rules

    docs = documents
    if c4:
        docs = (c4_clean(docs, text_col=text_col, out_col="_c4")
                .where(F.col("c4_pass"))
                .drop(text_col)
                .withColumnRenamed("_c4", text_col)
                .drop("c4_sentences", "c4_no_lorem", "c4_no_brace",
                      "c4_no_blockword", "c4_pass"))
    if gopher:
        cols = docs.columns
        docs = (gopher_rules(docs, text_col=text_col)
                .where(F.col("gopher_pass")).select(*cols))
    kept = corpus_select(docs, text_col=text_col, id_col=id_col,
                         langs=langs, min_quality=min_quality,
                         min_tokens=min_tokens)
    surv = docs.join(kept.select(id_col), id_col)
    if substring_k:
        surv = substring_dedup(surv, text_col=text_col, id_col=id_col,
                               k=int(substring_k))
    if temperature_alpha is not None:
        if not source_col or not target_total:
            raise ValueError("temperature mixing needs source_col "
                             "and target_total")
        # the composite pack id below is integer arithmetic: a string id
        # (url-keyed corpora) would turn it NULL, silently emptying the
        # pack join (ADVICE r5) — fail loudly instead
        id_type = dict(surv.dtypes).get(id_col, "")
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"temperature mixing needs an integer {id_col!r} for the "
                f"composite pack id (got {id_type!r}); hash string ids to "
                "a long upstream (e.g. xxhash64)")
        max_up = 8.0  # pinned: temperature_resample's max_upsample
        headroom = 64
        if int(max_up) + 2 > headroom:
            raise ValueError("composite pack id headroom exceeded: raise "
                             "headroom alongside max_upsample")
        surv = temperature_resample(surv, source_col=source_col,
                                    id_col=id_col,
                                    alpha=float(temperature_alpha),
                                    target_total=int(target_total),
                                    seed=seed, max_upsample=max_up)
        # duplicated rows must pack as distinct units: composite id; the
        # copy cap is pinned above so the headroom provably fits
        surv = (surv.withColumn(
            "_pkid", F.col(id_col).cast("long") * headroom + F.col("copy")))
    else:
        surv = surv.withColumn("copy", F.lit(0)) \
                   .withColumn("_pkid", F.col(id_col))
    sized = surv.withColumn(
        "_ntok", F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                                 lambda w: w != "")))
    slices = pack_chunks(sized.select("_pkid", "_ntok"),
                         context_len=context_len, id_col="_pkid",
                         len_col="_ntok", seed=seed)
    return (slices.join(sized.select("_pkid", id_col, "copy", text_col),
                        "_pkid")
            .select("pack_id", id_col, "copy", "begin", "end", text_col))
