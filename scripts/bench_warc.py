"""WARC ingest throughput + parallel-scaling evidence: generate a
multi-file .warc.gz corpus once (driver-side, no Spark — raw record
bytes through gzip), then time the full ingest path
``read_warc_pages → ingest_pages → count`` at two parallelism levels
in SEPARATE cold JVMs (the sandbox's two-cluster-size proxy; same
protocol as scripts/bench_scaling.py).

One WARC file = one task is the operator's scale contract, so the
file count (default 32) bounds usable parallelism exactly the way a
Common Crawl segment listing does.

Usage: python scripts/bench_warc.py [n_files] [pages_per_file]
(default 32 / 8000). Prints one JSON line; copy numbers into
BENCH/BASELINE.md manually.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PER_FILE = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
LEVELS = [int(v) for v in os.environ.get(
    "WARC_BENCH_LEVELS", "8,32").split(",")]
ATTEMPTS = int(os.environ.get("SPANDEX_BENCH_ATTEMPTS", "2"))

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from spandex_spark.session import get_spark
from spandex_spark.pipeline import ingest_pages
from spandex_spark.sources.warc import read_warc_pages
spark = get_spark("bench_warc", master="local[{cpus}]",
                  shuffle_partitions={shuffle})
t0 = time.time()
n = ingest_pages(read_warc_pages(spark, {glob!r})).count()
print("RESULT", n, time.time() - t0)
"""


def gen_corpus(root: str) -> str:
    from spandex_spark.sources.warc import _warc_record
    os.makedirs(root, exist_ok=True)
    body_pad = b"<p>" + b"crawl page body with boilerplate text " * 5 + b"</p>"
    for f in range(N_FILES):
        path = os.path.join(root, f"seg-{f:05d}.warc.gz")
        with open(path, "wb") as out:
            # every ~10th page is a duplicate recrawl of page 0 of the file
            for i in range(PER_FILE):
                k = (f * PER_FILE) if i % 10 == 9 else (f * PER_FILE + i)
                url = f"https://site{k % 977}.example/p/{k:09d}"
                body = (b"<html><body>" + body_pad
                        + f"geo: {(k % 160) / 8 - 10 + 0.05:.5f}, "
                          f"{(k % 320) / 16 - 10 + 0.05:.5f} page {k}"
                          .encode() + b"</body></html>")
                http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                        + f"Content-Length: {len(body)}\r\n\r\n".encode()
                        + body)
                sec = k % 86400
                date = (f"2026-01-01T{sec // 3600:02d}:"
                        f"{sec // 60 % 60:02d}:{sec % 60:02d}Z")
                out.write(gzip.compress(_warc_record(
                    "response",
                    [("WARC-Target-URI", url), ("WARC-Date", date),
                     ("Content-Type", "application/http; msgtype=response")],
                    http), compresslevel=1))
    return os.path.join(root, "seg-*.warc.gz")


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tempfile.mkdtemp(prefix="warc_bench_")
    try:
        glob = gen_corpus(root)
        total = N_FILES * PER_FILE
        results = {}
        for cpus in LEVELS:
            best, rows = None, None
            for _ in range(ATTEMPTS):
                code = _CHILD.format(repo=repo, cpus=cpus, glob=glob,
                                     shuffle=max(cpus * 2, 16))
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, check=True).stdout
                line = [l for l in out.splitlines()
                        if l.startswith("RESULT")][0]
                _, n, dt = line.split()
                best = float(dt) if best is None else min(best, float(dt))
                rows = int(n)
            results[cpus] = {"sec": round(best, 3),
                             "pages_per_sec": round(total / best),
                             "rows_out": rows}
        lo, hi = LEVELS[0], LEVELS[-1]
        eff = ((results[hi]["pages_per_sec"] / results[lo]["pages_per_sec"])
               / (hi / lo))
        print(json.dumps({
            "metric": "warc ingest (read_warc_pages -> ingest_pages)",
            "n_files": N_FILES, "pages": total,
            "levels": results, "scaling_eff": round(eff, 3),
            "attempts_per_level": ATTEMPTS}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
