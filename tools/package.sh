#!/usr/bin/env bash
# Package tfidf_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/tfidf_spark.zip
zip -qr dist/tfidf_spark.zip tfidf_spark -x '*__pycache__*'
echo "dist/tfidf_spark.zip"
