"""Throughput for the round-5 post-final wave operators
(substring_dedup, anchor layer, HITS, sequence packing, DSIR, bitext
mining, unigram tokenizer) at sf0.1-derived scale on local[32] — same
bench-hygiene protocol as bench_final_ops.py (serialized jobs, one
session, wall + derived throughput; inputs multiplied from the
testdata tables so row counts are honest).

Run: python scripts/bench_session_ops.py [--mult 64]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(sys.argv[sys.argv.index("--mult") + 1]) \
    if "--mult" in sys.argv else 64


def main():
    from pyspark.sql import functions as F

    from spandex_spark.session import get_spark

    spark = get_spark("bench_session_ops", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    def t(name, fn, n, unit="rows"):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 3), unit: n,
                     f"{unit}_per_sec": round(n / dt)}
        print(name, out[name], flush=True)

    docs = spark.read.parquet(f"{SF}/documents.parquet").persist()
    n_docs = docs.count()

    # ---- substring_dedup: MULT copies so cross-doc dup spans exist --
    from spandex_spark.operators.dedup import substring_dedup
    big = (docs.withColumn("rep", F.explode(
        F.sequence(F.lit(0), F.lit(MULT // 8 - 1))))
        .select((F.col("doc_id") * (MULT // 8) + F.col("rep"))
                .alias("doc_id"), "text").persist())
    n_big = big.count()
    n_tok = big.select(F.sum(F.size(F.split("text", r"\s+")))
                       ).collect()[0][0]
    t(f"substring_dedup ({n_big} docs, {n_tok} tokens, k=50)",
      lambda: substring_dedup(big, k=50).select(
          F.sum(F.length("text"))).collect(), n_big, unit="docs")
    out[f"substring_dedup ({n_big} docs, {n_tok} tokens, k=50)"][
        "tokens_per_sec"] = round(
        n_tok / out[f"substring_dedup ({n_big} docs, {n_tok} tokens, "
                    f"k=50)"]["sec"])
    big.unpersist()

    # ---- anchor layer + HITS ----------------------------------------
    from spandex_spark.operators.linkgraph import (extract_anchors,
                                                   anchor_stats,
                                                   host_graph, hits)
    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    pages = (cust.withColumn("rep", F.explode(F.sequence(
        F.lit(0), F.lit(7))))
        .select((F.col("c_custkey") * 8 + F.col("rep")).alias("id"))
        .select(F.format_string("http://s%d.example/p%d",
                                F.col("id") % 5000, F.col("id"))
                .alias("url"),
                F.format_string(
                    "<a href='http://t%d.example/x'>target %d page</a> "
                    "<a href='http://hub.example/'>home</a> "
                    "<a href='http://t%d.example/y'><img src=i.png></a>",
                    F.col("id") % 2000, F.col("id") % 7,
                    F.col("id") % 400).alias("html"))
        .persist())
    n_pages = pages.count()
    anchors = extract_anchors(pages).persist()
    n_anchors = anchors.count()
    t(f"extract_anchors ({n_pages} pages -> {n_anchors} anchors)",
      lambda: extract_anchors(pages).count(), n_pages, unit="pages")
    t(f"anchor_stats ({n_anchors} anchors, k=5)",
      lambda: anchor_stats(anchors, k=5).count(), n_anchors,
      unit="anchors")
    hg = host_graph(anchors.selectExpr("'http://x.example/' as src_url",
                                       "dst_url")
                    .unionByName(anchors.select("src_url", "dst_url"))
                    ).persist()
    n_edges = hg.count()
    t(f"hits ({n_edges} host edges, 10 iters)",
      lambda: hits(hg, iters=10).count(), n_edges, unit="edges")
    pages.unpersist(); anchors.unpersist(); hg.unpersist()

    # ---- sequence packing -------------------------------------------
    from spandex_spark.operators.packing import pack_chunks, pack_ffd
    n_pk = 2_000_000
    pdocs = spark.range(n_pk).select(
        F.col("id").alias("doc_id"),
        (F.abs(F.xxhash64("id")) % 1900 + 1).alias("n_tokens")).persist()
    pdocs.count()
    t(f"pack_chunks ({n_pk} docs, L=2048)",
      lambda: pack_chunks(pdocs, context_len=2048).count(),
      n_pk, unit="docs")
    t(f"pack_ffd ({n_pk} docs, L=2048)",
      lambda: pack_ffd(pdocs, context_len=2048).count(),
      n_pk, unit="docs")
    pdocs.unpersist()

    # ---- DSIR --------------------------------------------------------
    from spandex_spark.operators.dsir import dsir_weights, dsir_sample
    raw = (docs.withColumn("rep", F.explode(
        F.sequence(F.lit(0), F.lit(MULT // 8 - 1))))
        .select((F.col("doc_id") * (MULT // 8) + F.col("rep"))
                .alias("doc_id"), "text").persist())
    n_raw = raw.count()
    tgt = docs.where(F.col("lang") == "en").limit(500).select("text")
    t(f"dsir_weights ({n_raw} raw docs, 2-gram, 10k buckets)",
      lambda: dsir_weights(raw, tgt, ngram=2, buckets=10_000)
      .where(F.col("log_weight").isNotNull()).count(),
      n_raw, unit="docs")
    raw.unpersist()

    # ---- bitext mining -----------------------------------------------
    from spandex_spark.operators.bitext import mine_bitext
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    n_emb = emb.count()
    src = emb.limit(n_emb // 2)
    t(f"mine_bitext ({n_emb // 2} src x {n_emb} tgt, k=4, brute)",
      lambda: mine_bitext(src, emb, k=4).count(),
      n_emb // 2 * n_emb, unit="pairs_scored")

    # ---- unigram tokenizer --------------------------------------------
    from spandex_spark.operators.unigram import train_unigram, apply_unigram
    t0 = time.time()
    vocab = train_unigram(docs.limit(500), vocab_size=2000,
                          max_piece_len=6, lowercase=True)
    dt = time.time() - t0
    out["train_unigram (500-doc table, target 2000)"] = {
        "sec": round(dt, 3), "pieces": len(vocab)}
    print("train_unigram", out["train_unigram (500-doc table, "
                               "target 2000)"], flush=True)
    t(f"apply_unigram ({n_docs} docs)",
      lambda: apply_unigram(docs, vocab, lowercase=True).select(
          F.sum(F.size("pieces"))).collect(), n_docs, unit="docs")

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
