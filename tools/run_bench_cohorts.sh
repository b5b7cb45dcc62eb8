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
# must NOT kill the sweep: Bench writes a start-of-run STUB artifact
# marking every planned query as an error and overwrites it on success,
# so a dead cohort leaves its death certificate behind and the loop moves
# on — no `set -e` around the sbt call, but pipefail so the `tail -1`
# pipe can't mask sbt's real exit status (ADVICE r16).
#
# Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_PASSES=1] [SPARK_GRAFT_IO_CODEC=zstd]
#        [SPARK_GRAFT_SHUFFLE_PARTITIONS=320] tools/run_bench_cohorts.sh <N> <outdir> [start]
set -uo pipefail
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
  rc=0
  SPARK_GRAFT_COHORT="$i/$N" \
    SPARK_GRAFT_BENCH_OUT="$OUT/cohort_${i}_of_${N}.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1 || rc=$?
  if [[ $rc -ne 0 ]]; then
    echo "cohort $i FAILED (rc=$rc) — its artifact is the start-of-run stub (all queries errored); continuing"
  fi
done
python3 tools/merge_bench_cohorts.py "$OUT" "$OUT/merged.json"
echo "merged -> $OUT/merged.json"
