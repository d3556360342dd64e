#!/usr/bin/env bash
# Literal spark-submit launcher for the composed production job.
# No assembly needed: Spark provides its own jars, and this project's
# only runtime dependency IS Spark — `sbt package`'s thin jar suffices.
#
#   bin/run-job.sh --input <pages parquet|iceberg root> \
#                  --output <job root> --run-id <id> [RunJob flags...]
#
# Env: SPARK_HOME (default /opt/spark), MASTER (default local[32]),
#      DRIVER_MEM (default 8g — spark-submit's 1g default OOMs a
#      local[32] driver, which in local mode hosts every executor).
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
MASTER="${MASTER:-local[32]}"
JAR=$(ls target/scala-2.13/piiredacterspark_2.13-*.jar 2>/dev/null | grep -v -- -tests | head -1 || true)
if [ -z "$JAR" ]; then
  echo "thin jar not found - building with sbt package" >&2
  sbt -batch package >&2
  JAR=$(ls target/scala-2.13/piiredacterspark_2.13-*.jar | grep -v -- -tests | head -1)
fi
exec "$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --driver-memory "${DRIVER_MEM:-8g}" \
  --class graft.RunJob \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" "$@"
