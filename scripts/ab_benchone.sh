#!/bin/bash
# Interleaved A/B of one query between two builds (old/new classfiles).
# Alternates old→new JVMs N times so host drift cancels; each JVM runs
# BenchOne with REPS warm reps (min-of over all JVMs is the estimator).
#   scripts/ab_benchone.sh <query> [alternations=4] [reps=2] \
#       [old_classes=/tmp/repo_old/target/scala-2.13/classes] \
#       [new_classes=/root/repo/target/scala-2.13/classes]
set -euo pipefail
Q="$1"; N="${2:-4}"; REPS="${3:-2}"
OLD="${4:-/tmp/repo_old/target/scala-2.13/classes}"
NEW="${5:-/root/repo/target/scala-2.13/classes}"
RUN="$(dirname "$0")/run_main.sh"
# alternate which variant runs FIRST each round: a fixed old->new order
# showed a systematic position bias (~5-10% against the second JVM of a
# pair — thermal/page-cache warmup), so odd rounds run old first and
# even rounds new first; means over all rounds cancel the bias.
for i in $(seq 1 "$N"); do
  if [ $((i % 2)) = 1 ]; then ORDER="old new"; else ORDER="new old"; fi
  for v in $ORDER; do
    [ "$v" = old ] && C="$OLD" || C="$NEW"
    CLASSES_DIR="$C" "$RUN" graft.BenchOne "$Q" "$REPS" 2>/dev/null \
      | sed "s/^/[$v $i] /" | grep benchone || true
  done
done
