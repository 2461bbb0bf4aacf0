#!/usr/bin/env bash
# Package the engine for spark-submit --py-files distribution.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/searchengine_spark.zip
zip -qr dist/searchengine_spark.zip searchengine_spark -x '*__pycache__*'
echo "dist/searchengine_spark.zip"
