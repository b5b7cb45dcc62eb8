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
# A failed cohort (e.g. a fatal JVM error taking the SparkContext down)
# must NOT kill the sweep: its queries are reported as errors in its own
# artifact and the loop moves on — so no `set -e` around the sbt call.
#
# Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_PASSES=1] [SPARK_GRAFT_IO_CODEC=zstd]
#        [SPARK_GRAFT_SHUFFLE_PARTITIONS=320] tools/run_bench_cohorts.sh <N> <outdir> [start]
set -u
# d18_fuzzy_clusters at sf10 dies with a fatal executor error under the
# 8g default in a FRESH JVM (BASELINE §15c) — marathon JVMs only survived
# on previously-expanded heaps. Callers may still override.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}"
N="${1:?number of cohorts}"
OUT="${2:?output dir for per-cohort jsons}"
START="${3:-0}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for ((i = START; i < N; i++)); do
  echo "=== cohort $i/$N ==="
  SPARK_GRAFT_COHORT="$i/$N" \
    SPARK_GRAFT_BENCH_OUT="$OUT/cohort_${i}_of_${N}.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1 || \
    echo "cohort $i FAILED (rc=$?) — continuing"
done
python3 tools/merge_bench_cohorts.py "$OUT" "$OUT/merged.json"
echo "merged -> $OUT/merged.json"
