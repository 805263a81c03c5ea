#!/usr/bin/env bash
# Package the engine and submit the resumable web-face extraction job.
# Usage: scripts/submit_webtext.sh <input_pages_path> <output_path> [spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
IN="$1"; OUT="$2"; shift 2

ZIP="$(mktemp -d)/servico_ocr_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" servico_ocr_spark)

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$@" \
  "$REPO/scripts/run_webtext.py" "$IN" "$OUT"
