#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/aus_land_data_etl_spark.zip
zip -qr dist/aus_land_data_etl_spark.zip aus_land_data_etl_spark -x '*__pycache__*'
echo "dist/aus_land_data_etl_spark.zip"
