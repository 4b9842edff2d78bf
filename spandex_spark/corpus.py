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
