#!/usr/bin/env bash
# Launch the engine the way the north rule specifies:
#   spark-submit --py-files <package zip> <driver script> [args...]
#
# In this sandbox the master defaults to local[8]; on a real cluster set
# SPARK_GRAFT_MASTER=yarn (or k8s://...) — the same artifact works
# unchanged because session.py defers master/conf to the launcher when
# running under spark-submit.
#
# Examples:
#   tools/spark_submit.sh run.py --config config/default.json --out /tmp/run_out
#   SPARK_GRAFT_MASTER=local[32] tools/spark_submit.sh bench.py
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${SPARK_GRAFT_MASTER:-local[8]}"
ZIP="$(python tools/package_pyfiles.py)"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
  --py-files "$ZIP" \
  "$@"
