#!/bin/bash
# Bare-JVM runner for graft mains (same flags as build.sbt) — avoids sbt
# startup in measurement loops and lets A/B scripts point CLASSES_DIR at
# a different build (e.g. a worktree at an older commit).
#   CLASSES_DIR=<path> scripts/run_main.sh graft.BenchOne llm_dedup_audit 2
set -euo pipefail
CLASSES_DIR="${CLASSES_DIR:-/root/repo/target/scala-2.13/classes}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.legacy.parquet.nanosAsLong=true \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES_DIR:/opt/spark/jars/*" "$@"
