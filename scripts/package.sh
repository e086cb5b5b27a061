#!/usr/bin/env bash
# Build dist/engine.zip for spark-submit --py-files (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip ecg_feature_engineering_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -3
