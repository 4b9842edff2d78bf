"""Throughput for the round-5 closing-batch operators (bloom, SSSP,
BPE, KN-LM, split, kriging) at sf0.1 scale on local[32] — same
bench-hygiene protocol as bench_new_ops.py (serialized jobs, one
session, wall + derived throughput, best window of N runs).

Run: python scripts/bench_final_ops.py [--mult 64]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(sys.argv[sys.argv.index("--mult") + 1]) \
    if "--mult" in sys.argv else 64


def main():
    from pyspark.sql import functions as F

    from spandex_spark.session import get_spark

    spark = get_spark("bench_final_ops", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    def t(name, fn, unit_rows, unit="rows"):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 3), unit: unit_rows,
                     f"{unit}_per_sec": round(unit_rows / dt)}
        print(name, out[name], flush=True)

    from spandex_spark.operators.bloom import (bloom_build, bloom_params,
                                               bloom_probe)
    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    urls = (cust.withColumn("rep", F.explode(F.sequence(
        F.lit(0), F.lit(MULT - 1))))
        .select((F.col("c_custkey") * MULT + F.col("rep")).alias("id"))
        .select("id", F.concat(F.lit("https://h.example/p/"),
                               F.col("id")).alias("url"))
        .persist())
    n_urls = urls.count()
    m, k = bloom_params(n_urls, 0.01)
    bloom = bloom_build(urls, "url", m_bits=m, k=k).persist()
    t(f"bloom_build ({n_urls} urls, m={m >> 20}Mbit, k={k})",
      lambda: bloom.count(), n_urls)
    t("bloom_probe (same keys, broadcast)",
      lambda: bloom_probe(urls, "url", bloom, id_col="id", m_bits=m,
                          k=k).filter(~F.col("maybe_seen")).count(),
      n_urls)

    from spandex_spark.operators.network import shortest_paths
    rng = random.Random(7)
    n_nodes, n_edges = 20000, 100000
    edges = spark.createDataFrame(
        [(rng.randrange(n_nodes), rng.randrange(n_nodes),
          round(rng.uniform(0.5, 3.0), 3)) for _ in range(n_edges)],
        "src long, dst long, weight double").persist()
    edges.count()
    srcs = spark.createDataFrame([(0,), (7,), (99,)], "node long")
    t(f"shortest_paths ({n_edges} edges, 3 sources)",
      lambda: shortest_paths(edges, srcs, directed=False).count(),
      n_edges, unit="edges")

    docs = spark.read.parquet(f"{SF}/documents.parquet").persist()
    n_docs = docs.count()
    from spandex_spark.operators.bpe import apply_bpe, train_bpe
    t0 = time.time()
    merges = train_bpe(docs.limit(500), num_merges=64)
    dt = time.time() - t0
    out["train_bpe (500-doc table, 64 merges)"] = {
        "sec": round(dt, 3), "merges": len(merges),
        "merges_per_sec": round(len(merges) / dt, 2)}
    print("train_bpe", out["train_bpe (500-doc table, 64 merges)"],
          flush=True)
    t(f"apply_bpe ({n_docs} docs)",
      lambda: apply_bpe(docs, merges).select(
          F.sum(F.size("pieces"))).collect(), n_docs, unit="docs")

    from spandex_spark.operators.knlm import kn_score, train_kn_lm
    t0 = time.time()
    model = train_kn_lm(docs, n=3)
    dt = time.time() - t0
    out["train_kn_lm (n=3)"] = {"sec": round(dt, 3), "docs": n_docs,
                                "docs_per_sec": round(n_docs / dt)}
    print("train_kn_lm", out["train_kn_lm (n=3)"], flush=True)
    t(f"kn_score ({n_docs} docs, 3 join orders)",
      lambda: kn_score(docs, model).agg(F.avg("perplexity")).collect(),
      n_docs, unit="docs")

    from spandex_spark.operators.split import split_by_lines
    from spandex_spark.sources.grids import parcels_df
    parcels = parcels_df(spark)
    n_parcels = parcels.count()
    xs = [(-10.0 + 0.37 * i) for i in range(54)]
    blades = spark.createDataFrame(
        [(i, {"kind": 2, "xs": [x, x], "ys": [-10.0, 10.0],
              "ring_offsets": [0, 2],
              "bbox": {"minx": x, "miny": -10.0, "maxx": x,
                       "maxy": 10.0}}) for i, x in enumerate(xs)],
        "lid long, geom struct<kind:tinyint, xs:array<double>,"
        " ys:array<double>, ring_offsets:array<int>,"
        " bbox:struct<minx:double,miny:double,maxx:double,"
        "maxy:double>>")
    t(f"split_by_lines ({n_parcels} parcels x 54 blades)",
      lambda: split_by_lines(parcels, blades,
                             target_id_col="parcel_id").count(),
      n_parcels, unit="parcels")

    from spandex_spark.operators.kriging import kriging_grid
    from spandex_spark.sources.grids import derived_points
    pts = (derived_points(cust, "c_custkey")
           .withColumn("v", (F.col("c_custkey") % 7).cast("double")))
    n_pts = pts.count()
    t(f"kriging_grid 100x100 r=0.5 k=16 ({n_pts} pts)",
      lambda: kriging_grid(pts, value_col="v",
                           variogram={"model": "exponential",
                                      "nugget": 0.1, "psill": 1.0,
                                      "range": 1.0},
                           origin_x=-10.0, origin_y=-10.0, step=0.2,
                           nx=100, ny=100, radius=0.5).count(),
      100 * 100, unit="cells")

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
