"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with/aggregate
— stays in codegen, no Python), and a random-hyperplane LSH-bucketed
variant as the 100 TB scale path (candidates only from colliding buckets;
recall tuned by n_tables x n_bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    """Cosine similarity of two array<numeric> columns, fully JVM-side."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot_expr(ad, bd) / (norm_expr(ad) * norm_expr(bd))


def ann_bruteforce(queries: DataFrame, corpus: DataFrame, *, k: int,
                   q_id: str = "vec_id", c_id: str = "vec_id",
                   q_vec: str = "embedding", c_vec: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the smaller side, window top-k.
    Returns (query_id, rank, neighbor_id, cosine). Self-matches excluded
    when ids collide."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv"))
    cand = (q.crossJoin(F.broadcast(c))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine", cosine_expr(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_bucket_udf(dim: int, n_tables: int = 8, n_bits: int = 12,
                   seed: int = 42):
    """Signed-random-projection bucket ids: array of n_tables (table, code)
    longs per vector. Deterministic (seeded hyperplanes)."""
    planes = _hyperplanes(dim, n_tables, n_bits, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vec: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, np.float64) for v in vec])
        out = []
        codes = np.zeros((mat.shape[0], n_tables), np.int64)
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (N, n_bits)
            bits = (proj > 0).astype(np.int64)
            code = np.zeros(mat.shape[0], np.int64)
            for b in range(n_bits):
                code |= bits[:, b] << b
            codes[:, t] = (np.int64(t) << np.int64(n_bits)) | code
        for i in range(mat.shape[0]):
            out.append(codes[i].tolist())
        return pd.Series(out)

    return _buckets


def ann_lsh(queries: DataFrame, corpus: DataFrame, *, k: int, dim: int,
            q_id: str = "vec_id", c_id: str = "vec_id",
            q_vec: str = "embedding", c_vec: str = "embedding",
            n_tables: int = 8, n_bits: int = 10, seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates from LSH bucket collisions only, exact
    cosine rerank. Queries with no collisions return no rows (raise
    n_tables / lower n_bits for recall)."""
    buckets = lsh_bucket_udf(dim, n_tables, n_bits, seed)
    q = (queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
         .withColumn("_b", F.explode(buckets(F.col(q_vec)))))
    c = (corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv"))
         .withColumn("_b", F.explode(buckets(F.col(c_vec)))))
    cand = (q.join(c, "_b")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("cosine", cosine_expr(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))
