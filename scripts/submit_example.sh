#!/usr/bin/env bash
# spark-submit deployment (north rule: "runs under spark-submit --py-files on
# multi-executor clusters at N and 4N executors").
#
# Package the engine as a zip and submit the validation job; the same zip
# works at any executor count — scaling knobs ride spark-submit flags, the
# engine code has none baked in.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/json_schema_py_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" json_schema_py_spark -x '*__pycache__*'

EXECUTORS="${EXECUTORS:-8}"           # N; re-run with 4N for the scaling pair
INPUT="${INPUT:-/root/testdata/sf0.1}"

spark-submit \
  --master "${MASTER:-local[$EXECUTORS]}" \
  --num-executors "$EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 8g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --py-files "$ZIP" \
  scripts/run_validation_job.py "$INPUT" "${OUT:-/tmp/violations_out}" "${RUN_ID:-run-0}"
