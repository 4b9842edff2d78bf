"""Throughput for the last round-5 wave (toponym resolution, C4
cleaning, GPX/KML parsing, Gale-Church alignment) — same protocol as
bench_session_ops.py.

Run: python scripts/bench_late_ops.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import functions as F

    from spandex_spark.session import get_spark

    spark = get_spark("bench_late_ops", master="local[32]",
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

    # toponym: 2M mentions, 3 candidates per name, ambiguous gazetteer
    from spandex_spark.operators.toponym import resolve_toponyms
    n_m = 2_000_000
    men = spark.range(n_m).select(
        (F.col("id") % 400_000).alias("doc_id"),
        F.format_string("place%d", F.abs(F.xxhash64("id")) % 5000)
        .alias("mention")).persist()
    men.count()
    gaz = spark.range(15000).select(
        F.format_string("place%d", F.col("id") % 5000).alias("name"),
        F.col("id").alias("gaz_id"),
        (F.abs(F.xxhash64(F.col("id") + 3)) % 1_000_000).cast("double")
        .alias("population"),
        ((F.col("id") * 7) % 360 - 180.0).alias("lon"),
        ((F.col("id") * 3) % 170 - 85.0).alias("lat"))
    t(f"resolve_toponyms ({n_m} mentions, 3 cands each)",
      lambda: resolve_toponyms(men, gaz).count(), n_m, unit="mentions")
    men.unpersist()

    # c4_clean over multiplied documents with injected newlines
    from spandex_spark.operators.textstats import c4_clean
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(63))))
           .select((F.col("doc_id") * 64 + F.col("rep")).alias("doc_id"),
                   F.regexp_replace("text", r"(\w+ \w+ \w+ \w+ \w+ \w+)",
                                    "$1.\n").alias("text"))
           .persist())
    n_docs = big.count()
    t(f"c4_clean ({n_docs} docs)",
      lambda: c4_clean(big).where("c4_pass").count(), n_docs, unit="docs")
    big.unpersist()

    # GPX: 100k tracks x 50 points
    from spandex_spark.sources.gpx import parse_gpx
    gpx = spark.range(100_000).select(
        F.col("id").alias("track_id"),
        F.concat(F.lit("<gpx><trk><trkseg>"),
                 F.aggregate(F.sequence(F.lit(0), F.lit(49)),
                             F.lit(""), lambda acc, i: F.concat(
                                 acc, F.format_string(
                                     "<trkpt lat='%.4f' lon='%.4f'/>",
                                     40.0 + i * 0.001, 7.0 + i * 0.001))),
                 F.lit("</trkseg></trk></gpx>")).alias("gpx")).persist()
    n_tracks = gpx.count()
    t(f"parse_gpx ({n_tracks} tracks x 50 pts)",
      lambda: parse_gpx(gpx).count(), n_tracks * 50, unit="points")
    gpx.unpersist()

    # KML: 50k documents x 5 polygon placemarks
    from spandex_spark.sources.kml import parse_kml
    pm = ("<Placemark><Polygon><outerBoundaryIs><LinearRing><coordinates>"
          "0,0 2,0 2,2 0,2 0,0"
          "</coordinates></LinearRing></outerBoundaryIs></Polygon>"
          "</Placemark>")
    kml = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.lit("<kml>" + pm * 5 + "</kml>").alias("kml")).persist()
    n_k = kml.count()
    t(f"parse_kml ({n_k} docs x 5 placemarks)",
      lambda: parse_kml(kml).where(F.col("geom").isNotNull()).count(),
      n_k * 5, unit="placemarks")
    kml.unpersist()

    # alignment: 20k doc pairs x ~8 sentences
    from spandex_spark.operators.align import align_sentences
    sent = "This is one full sentence with enough words in it. "
    pairs = spark.range(20_000).select(
        F.col("id").alias("pair_id"),
        F.lit(sent * 8).alias("src_text"),
        F.lit(sent * 8).alias("tgt_text")).persist()
    n_p = pairs.count()
    t(f"align_sentences ({n_p} doc pairs x 8 sents)",
      lambda: align_sentences(pairs).count(), n_p, unit="pairs")
    pairs.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
