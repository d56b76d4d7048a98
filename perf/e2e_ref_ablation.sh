#!/bin/bash
# Reference-scale (640x480/9-obj) e2e knob ablation — VERDICT r4 item 3:
# every registration-capacity default was tuned on the 160x220 toy scene;
# re-measure each lever at the scale the headline bench now runs.
#
#   bash perf/e2e_ref_ablation.sh [out/e2e_ref_ablation_r5.log]
#
# Each config runs the bench's e2e child (3 passes x 2 chunk sizes, stage
# table + JSON line). Quality impact of a candidate knob set is checked
# separately by replaying the CPU quality gates with the same env:
#   IBL_...=... python -m pytest tests/test_memory_e2e.py -q
set -u
LOG="${1:-out/e2e_ref_ablation_r5.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
: > "$LOG"

run() {
  name="$1"; shift
  echo "=== $name ($*) ===" | tee -a "$LOG"
  env "$@" timeout 900 python bench.py --child e2e >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
  grep -E '^\{' "$LOG" | tail -1
}

run baseline IBL_NOOP=1
run linear_subsample IBL_LINEAR_SUBSAMPLE=1
run hyp256 IBL_NUM_HYP=256
run icp_min IBL_ICP_COARSE=6 IBL_ICP_FINE=8
run eval1024 IBL_EVAL_CAP=1024
run reg512 IBL_REG_CAP=512
run fpfh128_nn32 IBL_FPFH_CAP=128 IBL_FPFH_NN=32
run ransac1 IBL_RANSAC_PAIRS=1
run combo IBL_NUM_HYP=256 IBL_ICP_COARSE=6 IBL_ICP_FINE=8 \
    IBL_EVAL_CAP=1024 IBL_REG_CAP=512 IBL_FPFH_CAP=128 IBL_FPFH_NN=32
echo "done; full log in $LOG"
