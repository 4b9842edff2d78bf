#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule, BASELINE.json:14).
#   ./scripts/make_pyfiles.sh  →  dist/sx.zip
# Then:
#   spark-submit --py-files dist/sx.zip scripts/submit_job.py --out /data/out
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sx.zip
zip -qr dist/sx.zip spandex_spark/ -x '*__pycache__*'
echo "dist/sx.zip ($(du -h dist/sx.zip | cut -f1))"
