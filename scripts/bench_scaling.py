"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors; sandbox stand-in: the SAME job + SAME input at
local[8] vs local[32], cold JVM per run).

Runs bench.py as a subprocess at each parallelism, repeats ``--runs`` times
per size, takes the best-of (steadiest proxy for steady-state on a shared
box), and writes BENCH/BASELINE.md plus BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    results = {}
    for cpus in (8, 32):
        best = None
        for i in range(runs):
            r = run_bench(cpus, sf_dir)
            if best is None or r["queries"]["pip_tag_knn"] < best["queries"]["pip_tag_knn"]:
                best = r
            print(f"local[{cpus}] run {i}: {r['queries']}", file=sys.stderr)
        results[cpus] = best
    tput8 = results[8]["pip_knn_rows_per_sec"]
    tput32 = results[32]["pip_knn_rows_per_sec"]
    eff = tput32 / (4.0 * tput8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    payload = {"sf_dir": sf_dir, "runs_per_size": runs,
               "local8": results[8], "local32": results[32],
               "pip_knn_rows_per_sec_8": tput8,
               "pip_knn_rows_per_sec_32": tput32,
               "scaling_efficiency_8_to_32": round(eff, 3),
               "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(payload, fh, indent=2)
    q8, q32 = results[8]["queries"], results[32]["queries"]
    md = f"""# BENCH/BASELINE — measured numbers (sandbox protocol, BASELINE.md)

Input: `{sf_dir}` (same files both sizes). Cold `spark-submit`-equivalent
JVM per run; best of {runs} runs per size. Headline job = two-phase PIP tag
+ nearest-feature (k=1) join over {results[32]['rows']['pip_tag_knn']:,}
lineitem-derived points vs the 400-zone grid + 32-POI layer.

| metric | local[8] (N) | local[32] (4N) |
|---|---|---|
| PIP+kNN wall (s) | {q8['pip_tag_knn']} | {q32['pip_tag_knn']} |
| PIP+kNN throughput (rows/s) | {tput8:,.0f} | {tput32:,.0f} |
| overlay (s) | {q8['overlay']} | {q32['overlay']} |
| zonal (s) | {q8['zonal']} | {q32['zonal']} |
| minhash dedup (s) | {q8['minhash_dedup']} | {q32['minhash_dedup']} |
| ANN top-k (s) | {q8['ann_topk']} | {q32['ann_topk']} |
| total headline (s) | {results[8]['value']} | {results[32]['value']} |

**Scaling efficiency (N→4N) = tput(32) / (4 x tput(8)) = {eff:.3f}**
(target >= 0.8; single-node caveat: local[8] and local[32] share one memory
bus and one JVM, so this is a lower-bound proxy for true multi-executor
scaling, where shuffle parallelism and page-cache bandwidth also scale.)
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
