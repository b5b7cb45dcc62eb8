#!/usr/bin/env bash
# Fresh-JVM cohort bench sweep (VERDICT r15 task 4).
#
# Single-JVM marathon sweeps at sf10 produced 10-25x phantom regressions
# from cross-query JVM contention (d19 952 s in the r15 sweep vs 239 s
# solo on the same code/host). This driver runs the suite as N cohorts,
# each in its OWN forked JVM (build.sbt: run/fork := true), so no query
# inherits another tier's heap/codegen/GC debris; merge the per-cohort
# artifacts with tools/merge_bench_cohorts.py.
#
# Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_PASSES=1] [SPARK_GRAFT_IO_CODEC=zstd]
#        [SPARK_GRAFT_SHUFFLE_PARTITIONS=320] tools/run_bench_cohorts.sh <N> <outdir>
set -euo pipefail
N="${1:?number of cohorts}"
OUT="${2:?output dir for per-cohort jsons}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for ((i = 0; i < N; i++)); do
  echo "=== cohort $i/$N ==="
  SPARK_GRAFT_COHORT="$i/$N" \
    SPARK_GRAFT_BENCH_OUT="$OUT/cohort_${i}_of_${N}.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
done
python3 tools/merge_bench_cohorts.py "$OUT" "$OUT/merged.json"
echo "merged -> $OUT/merged.json"
