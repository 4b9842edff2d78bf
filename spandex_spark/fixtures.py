"""Deterministic synthetic fixture generators (FIXTURES.md).

Mirrors the *shape* of the reference's test fixtures — small parcel/zone
layers with analytically known tag/overlap answers
(spandex/tests/test_spatialtoolz.py fixtures via spandex/tests/conftest.py)
— plus the web-scale graft input `pages` from BASELINE.json:15.

Everything is seeded (seed=42, per-table offset), pure numpy + pyarrow
(no Spark), so fixtures are byte-identical regardless of parallelism.
Expected outputs are exact by construction — the engine is never its own
oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
WORLD = (-10.0, -10.0, 10.0, 10.0)  # lon0, lat0, lon1, lat1

GEOM_FIELD = pa.struct([
    ("kind", pa.int8()),
    ("xs", pa.list_(pa.float64())),
    ("ys", pa.list_(pa.float64())),
    ("ring_offsets", pa.list_(pa.int32())),
    ("bbox", pa.struct([("minx", pa.float64()), ("miny", pa.float64()),
                        ("maxx", pa.float64()), ("maxy", pa.float64())])),
])


def _geom_value(xs, ys):
    return {
        "kind": 3,
        "xs": list(map(float, xs)),
        "ys": list(map(float, ys)),
        "ring_offsets": [0, len(xs)],
        "bbox": {"minx": float(min(xs)), "miny": float(min(ys)),
                 "maxx": float(max(xs)), "maxy": float(max(ys))},
    }


def _n(base: int, sf: float) -> int:
    return int(round(base * sf / 0.001))


def _write(table: pa.Table, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    return path


# ------------------------------------------------------------------ pages

def gen_pages(sf: float) -> pa.Table:
    """Common-Crawl-style pages (FIXTURES.md §1): 90% embed one geotag token,
    5% a gazetteer city name, 5% no geo signal (must yield NULL point)."""
    n = _n(1000, sf)
    rng = np.random.default_rng(SEED)
    gaz = gen_gazetteer().to_pydict()
    i = np.arange(n)
    lon = rng.uniform(WORLD[0], WORLD[2], n)
    lat = rng.uniform(WORLD[1], WORLD[3], n)
    kind = i % 20  # 0..17 geo token (90%), 18 gazetteer (5%), 19 none (5%)
    urls, texts, htmls = [], [], []
    base = ("the quick brown crawl indexed this page about urban data and "
            "spatial analysis tools for city planning ")
    for k in range(n):
        if kind[k] <= 17:
            body = f"{base}geo: {lat[k]:.5f}, {lon[k]:.5f} end of page {k}"
        elif kind[k] == 18:
            place = gaz["place"][k % 32]
            body = f"{base}reported from {place} today, page {k}"
        else:
            body = f"{base}no location mentioned on page {k}"
        urls.append(f"https://site{k % 97}.example/p/{k:08d}")
        texts.append(body)
        htmls.append(b"<html><body>" + body.encode("utf-8") + b"</body></html>")
    warc_ts = (np.datetime64("2026-01-01T00:00:00") + (i * 13).astype("timedelta64[s]"))
    langs = [["en", "es", "de", "fr", "zh"][k % 5] for k in range(n)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def gen_gazetteer() -> pa.Table:
    k = np.arange(32)
    return pa.table({
        "place": pa.array([f"ville{j:02d}" for j in k], pa.string()),
        "lon": pa.array(-8.0 + 1.0 * (k % 8), pa.float64()),
        "lat": pa.array(-8.0 + 2.0 * (k // 8), pa.float64()),
    })


# ------------------------------------------------------------------ vector layers

def gen_zones() -> pa.Table:
    """20x20 grid of 1-deg squares; zone_id = row*20 + col (FIXTURES.md §3)."""
    zone_ids, geoms, zclass = [], [], []
    for row in range(20):
        for col in range(20):
            zid = row * 20 + col
            x0, y0 = -10.0 + col, -10.0 + row
            xs = [x0, x0 + 1, x0 + 1, x0]
            ys = [y0, y0, y0 + 1, y0 + 1]
            zone_ids.append(zid)
            geoms.append(_geom_value(xs, ys))
            zclass.append(["res", "com", "ind", "open"][zid % 4])
    return pa.table({
        "zone_id": pa.array(zone_ids, pa.int64()),
        "geom": pa.array(geoms, GEOM_FIELD),
        "zclass": pa.array(zclass, pa.string()),
    })


def gen_parcels() -> pa.Table:
    """40x40 grid of 0.5-deg squares shifted by (0.25, 0.25), clipped to the
    window (FIXTURES.md §4)."""
    ids, geoms, vals = [], [], []
    pid = 0
    for row in range(40):
        for col in range(40):
            x0 = -10.0 + 0.25 + 0.5 * col
            y0 = -10.0 + 0.25 + 0.5 * row
            x1, y1 = min(x0 + 0.5, 10.0), min(y0 + 0.5, 10.0)
            xs = [x0, x1, x1, x0]
            ys = [y0, y0, y1, y1]
            ids.append(pid)
            geoms.append(_geom_value(xs, ys))
            vals.append(1000.0 + (pid % 17) * 37.5)
            pid += 1
    return pa.table({
        "parcel_id": pa.array(ids, pa.int64()),
        "geom": pa.array(geoms, GEOM_FIELD),
        "land_value": pa.array(vals, pa.float64()),
    })


def gen_poi(sf: float) -> pa.Table:
    n = _n(200, sf)
    rng = np.random.default_rng(SEED + 1)  # rng stream "poi"
    return pa.table({
        "poi_id": pa.array(np.arange(n), pa.int64()),
        "lon": pa.array(rng.uniform(WORLD[0], WORLD[2], n), pa.float64()),
        "lat": pa.array(rng.uniform(WORLD[1], WORLD[3], n), pa.float64()),
        "category": pa.array([["school", "park", "stop"][i % 3] for i in range(n)]),
    })


def gen_raster_tiles() -> pa.Table:
    """8x8 tiles x 50x50 pixels, res 0.05 deg, v = sin(lon_c) + cos(lat_c)
    (FIXTURES.md §6)."""
    ids, x0s, y0s, vals = [], [], [], []
    res, npix = 0.05, 50
    for ty in range(8):
        for tx in range(8):
            tid = ty * 8 + tx
            x0 = -10.0 + tx * npix * res
            y0 = -10.0 + ty * npix * res
            px = x0 + (np.arange(npix) + 0.5) * res
            py = y0 + (np.arange(npix) + 0.5) * res
            lon_c, lat_c = np.meshgrid(px, py)  # row-major: y rows, x cols
            v = np.sin(lon_c) + np.cos(lat_c)
            ids.append(tid)
            x0s.append(x0)
            y0s.append(y0)
            vals.append(v.ravel())
    return pa.table({
        "tile_id": pa.array(ids, pa.int64()),
        "x0": pa.array(x0s, pa.float64()),
        "y0": pa.array(y0s, pa.float64()),
        "res": pa.array([res] * 64, pa.float64()),
        "nx": pa.array([npix] * 64, pa.int32()),
        "ny": pa.array([npix] * 64, pa.int32()),
        "values": pa.array([v.tolist() for v in vals], pa.list_(pa.float64())),
    })


def gen_skewed_points(sf: float) -> pa.Table:
    """30% of points inside the 1x1-deg 'city' square [9,10]x[9,10]
    (zone 399), 70% uniform (FIXTURES.md §7)."""
    n = _n(10_000, sf)
    rng = np.random.default_rng(SEED + 2)
    n_city = int(n * 0.3)
    lon = np.concatenate([rng.uniform(9.0, 10.0, n_city),
                          rng.uniform(WORLD[0], WORLD[2], n - n_city)])
    lat = np.concatenate([rng.uniform(9.0, 10.0, n_city),
                          rng.uniform(WORLD[1], WORLD[3], n - n_city)])
    return pa.table({
        "url": pa.array([f"https://skew.example/{i}" for i in range(n)]),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })


# ------------------------------------------------------------------ expected oracles

def expected_tag(points_lon: np.ndarray, points_lat: np.ndarray) -> np.ndarray:
    """Closed-form zone oracle: zone_id = (floor(lat)+10)*20 + (floor(lon)+10),
    -1 (no zone) outside the window."""
    inside = ((points_lon >= -10) & (points_lon < 10)
              & (points_lat >= -10) & (points_lat < 10))
    zid = ((np.floor(points_lat) + 10) * 20 + (np.floor(points_lon) + 10)).astype(np.int64)
    return np.where(inside, zid, -1)


def expected_knn(qlon, qlat, plon, plat, poi_ids, k):
    """Brute-force haversine kNN oracle; ties broken by (dist, poi_id)."""
    from spandex_spark.geom import haversine_m
    out = []
    for qi in range(qlon.shape[0]):
        d = haversine_m(np.full(plon.shape, qlon[qi]), np.full(plon.shape, qlat[qi]),
                        plon, plat)
        order = np.lexsort((poi_ids, d))[:k]
        for rank, j in enumerate(order, 1):
            out.append((qi, rank, int(poi_ids[j]), float(d[j])))
    return out


def write_all(out_dir: str, sf: float) -> dict[str, str]:
    paths = {}
    paths["pages"] = _write(gen_pages(sf), out_dir, "pages")
    paths["gazetteer"] = _write(gen_gazetteer(), out_dir, "gazetteer")
    paths["zones"] = _write(gen_zones(), out_dir, "zones")
    paths["parcels"] = _write(gen_parcels(), out_dir, "parcels")
    paths["poi"] = _write(gen_poi(sf), out_dir, "poi")
    paths["raster_tiles"] = _write(gen_raster_tiles(), out_dir, "raster_tiles")
    paths["skewed_points"] = _write(gen_skewed_points(sf), out_dir, "skewed_points")
    return paths
