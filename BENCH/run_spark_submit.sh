#!/usr/bin/env bash
# Packaging requirement: ship the whole pipeline via spark-submit --py-files.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/kgspark.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" llm_text_to_knowledge_graph_spark)
exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-16}]}" \
  --py-files "$ZIP" \
  "$REPO/scripts/run_kg_pipeline.py" "$@"
