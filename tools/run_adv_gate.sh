#!/usr/bin/env bash
# Standing adversarial round-close gate (VERDICT r16 task 6): the r16
# adversarial corpus stops being a one-round instrument — every round
# re-checks, at small factor, that (a) the PPJoin-style filters stay
# LOSSLESS on the adversarial shape and (b) the production dedup rungs'
# wall on it stays in family (a filter regression shows up here first,
# not in a 500 s sf10adv rerun).
#
#   1. generate tmp/sf01adv (sf0.1-equivalent: sf0.01 documents at
#      factor 10, mode=adv — 5000 docs) if absent;
#   2. AdvCorpusSpec at sf0.01-equivalent (GRAFT_ADV_SPEC_DIR override) —
#      heavy tail, verbatim families, prefix-tier losslessness vs exact;
#   3. 3-row bench (d19_prefix_jaccard, d21c_containment_approx,
#      d3_minhash_lsh) on the adv corpus -> BENCH_r<N>_adv_gate.json;
#   4. (r18+) ANN recall contracts on tmp/sf01advemb (sf0.1-equivalent
#      clustered embeddings, generated if absent): s3 fixed-nProbe and
#      s19 fixed-hier (both expected LOW — the documented §16c failure
#      and its two-level analogue, kept as contrasts), s32 mass-adaptive
#      (must stay ~1e6), s33 adaptive-pool residual PQ (>= 0.9e6), s37
#      hier-adaptive (>= 0.8e6), trained k=64 fixed (expected LOW — the
#      §17h sharded-cluster collapse, the contrast) and trained k=64
#      adaptive (>= 0.9e6) — merged into the gate artifact under
#      "ann_recall" so a recall regression on the realistic shape
#      surfaces per-round in minutes, not in a one-round sweep.
#
# Usage: tools/run_adv_gate.sh <round>     e.g. tools/run_adv_gate.sh 17
set -euo pipefail
ROUND="${1:?round number for the artifact name}"
cd "$(dirname "$0")/.."
ADV=tmp/sf01adv
if [[ ! -d "$ADV/documents.parquet" ]]; then
  echo "=== generating $ADV (sf0.01 docs x10, mode=adv) ==="
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.01 $ADV 10 documents,customer adv" 2>&1 | tail -3
fi
# the spec applies ScaleUp.advDocs IN-MEMORY to the named SOURCE dir
# (raw sf0.01, not the pre-transformed $ADV — that would transform twice)
echo "=== AdvCorpusSpec at sf0.01-equivalent ==="
GRAFT_ADV_SPEC_DIR=/root/testdata/sf0.01 sbt -batch "testOnly graft.AdvCorpusSpec" 2>&1 | tail -4
echo "=== 3-row adversarial bench ==="
SPARK_GRAFT_SF_DIR="$ADV" \
  SPARK_GRAFT_BENCH_OUT="BENCH_r${ROUND}_adv_gate.json" \
  sbt -batch "runMain graft.Bench d19_prefix_jaccard d21c_containment_approx d3_minhash_lsh" 2>&1 | tail -1
ADVEMB=tmp/sf01advemb
if [[ ! -d "$ADVEMB/embeddings.parquet" ]]; then
  echo "=== generating $ADVEMB (sf0.01 embeddings x10, mode=advemb) ==="
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.01 $ADVEMB 10 embeddings advemb" 2>&1 | tail -3
fi
echo "=== ANN recall contracts on the adversarial embeddings shape ==="
sbt -batch "runMain graft.AdvRecallGate $ADVEMB tmp/adv_recall_gate.json" 2>&1 | tail -2
python3 - "BENCH_r${ROUND}_adv_gate.json" tmp/adv_recall_gate.json <<'EOF'
import json, sys
gate, rec = sys.argv[1], sys.argv[2]
d = json.load(open(gate)); d["ann_recall"] = json.load(open(rec))
json.dump(d, open(gate, "w"), indent=1)
r = d["ann_recall"]
print("merged ann_recall:", {k: v["recall_ppm"] for k, v in r.items()
                             if isinstance(v, dict)})
EOF
echo "gate artifact: BENCH_r${ROUND}_adv_gate.json — commit it with the round"
