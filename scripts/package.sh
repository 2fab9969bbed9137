#!/usr/bin/env bash
# Build engine.zip for spark-submit --py-files (the wheel-publish analog of
# the reference's CI, gen_whl_to_pypi_rapidocr_ort.yml).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip rapidocr_spark -x '*__pycache__*'
echo "built engine.zip ($(du -h engine.zip | cut -f1))"
