#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/jsonextract_spark.zip
zip -qr dist/jsonextract_spark.zip jsonextract_spark -x '*__pycache__*'
echo "dist/jsonextract_spark.zip"
