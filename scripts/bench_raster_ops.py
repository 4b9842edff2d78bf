"""Throughput evidence for the round-5 raster operators: focal slope
(halo exchange), rasterize (vector→raster burn), contour_lines +
assemble_contours — one synthetic 32x32-tile x 128x128-px grid
(16.8M pixels over [0,64)², a smooth trig field), local[$CPUS].

Usage: python scripts/bench_raster_ops.py [nt] [npx]
Prints one JSON line; copy numbers into BENCH/BASELINE.md manually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NPX = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RES = 64.0 / (NT * NPX)


def main():
    import numpy as np
    from pyspark.sql import functions as F
    from spandex_spark.session import get_spark
    from spandex_spark.operators.focal import slope
    from spandex_spark.operators.rasterize import rasterize
    from spandex_spark.operators.contour import (assemble_contours,
                                                 contour_lines)

    spark = get_spark("bench_raster", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    n_px = NT * NT * NPX * NPX

    def field(tile_id):
        ty, tx = divmod(tile_id, NT)
        x0, y0 = tx * NPX * RES, ty * NPX * RES
        px = x0 + (np.arange(NPX) + 0.5) * RES
        py = y0 + (np.arange(NPX) + 0.5) * RES
        lon, lat = np.meshgrid(px, py)
        return (np.sin(lon * 0.4) * 40 + np.cos(lat * 0.3) * 30).ravel()

    rows = [(t, (t % NT) * NPX * RES, (t // NT) * NPX * RES, RES, RES,
             NPX, NPX, field(t).tolist()) for t in range(NT * NT)]
    tiles = spark.createDataFrame(
        rows, "tile_id long, x0 double, y0 double, res double,"
              " res_y double, nx int, ny int, values array<double>"
    ).repartition(int(CPUS)).cache()
    tiles.count()

    out = {"n_tiles": NT * NT, "n_pixels": n_px, "cpus": int(CPUS)}

    t0 = time.time()
    assert slope(tiles, origin_x=0.0, origin_y=0.0).count() == NT * NT
    dt = time.time() - t0
    out["slope"] = {"sec": round(dt, 2), "px_per_sec": round(n_px / dt)}

    # 16x16 value grid of 4-unit squares burned onto the same spec
    polys = []
    for zy in range(16):
        for zx in range(16):
            x0, y0 = zx * 4.0, zy * 4.0
            xs = [x0, x0 + 4, x0 + 4, x0, x0]
            ys = [y0, y0, y0 + 4, y0 + 4, y0]
            polys.append((float(zy * 16 + zx),
                          {"kind": 3, "xs": xs, "ys": ys,
                           "ring_offsets": [0, 5],
                           "bbox": {"minx": x0, "miny": y0,
                                    "maxx": x0 + 4, "maxy": y0 + 4}}))
    pdf = spark.createDataFrame(
        polys, "value double, geom struct<kind:tinyint, xs:array<double>,"
               " ys:array<double>, ring_offsets:array<int>,"
               " bbox:struct<minx:double,miny:double,maxx:double,"
               "maxy:double>>")
    spec = tiles.drop("values")
    t0 = time.time()
    assert rasterize(pdf, spec).count() == NT * NT
    dt = time.time() - t0
    out["rasterize"] = {"sec": round(dt, 2), "px_per_sec": round(n_px / dt)}

    t0 = time.time()
    segs = contour_lines(tiles, levels=[-20.0, 0.0, 20.0],
                         origin_x=0.0, origin_y=0.0)
    n_segs = segs.count()
    dt = time.time() - t0
    out["contour"] = {"sec": round(dt, 2), "segments": n_segs,
                      "px_per_sec": round(n_px / dt)}

    t0 = time.time()
    n_lines = assemble_contours(contour_lines(
        tiles, levels=[-20.0, 0.0, 20.0], origin_x=0.0,
        origin_y=0.0)).count()
    out["contour_assembled"] = {"sec": round(time.time() - t0, 2),
                                "polylines": n_lines}

    from spandex_spark.operators.focal import flow_direction, focal_stats
    t0 = time.time()
    assert flow_direction(tiles, origin_x=0.0, origin_y=0.0).count() \
        == NT * NT
    dt = time.time() - t0
    out["flow_direction"] = {"sec": round(dt, 2),
                             "px_per_sec": round(n_px / dt)}

    t0 = time.time()
    assert focal_stats(tiles, origin_x=0.0, origin_y=0.0, stat="mean",
                       window=5).count() == NT * NT
    dt = time.time() - t0
    out["focal_stats_w5"] = {"sec": round(dt, 2),
                             "px_per_sec": round(n_px / dt)}

    from spandex_spark.operators.regions import region_group
    quant = tiles.withColumn(
        "values", F.transform("values",
                              lambda v: F.floor(v / 20.0).cast("double")))
    t0 = time.time()
    n_reg = (region_group(quant, origin_x=0.0, origin_y=0.0)
             .select(F.explode("values").alias("v"))
             .agg(F.countDistinct("v")).collect()[0][0])
    dt = time.time() - t0
    out["region_group"] = {"sec": round(dt, 2), "regions": int(n_reg),
                           "px_per_sec": round(n_px / dt)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
