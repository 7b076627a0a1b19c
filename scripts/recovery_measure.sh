#!/bin/bash
# One-shot post-outage TPU measurement pass (VERDICT r2 item 1): re-lands
# every pending device timing in sequence — ONE TPU process at a time
# (concurrent processes corrupt axon timings; CLAUDE.md).  Appends raw
# output to RECOVERY_r03.log; transcribe results into BASELINE.md rows.
#
#   bash scripts/recovery_measure.sh [quick]
#
# 'quick' runs only the headline bench + train bench (~20 min warm cache);
# the full pass adds profiles and the TTA batch sweep (~1-2 h cold).
set -u
cd "$(dirname "$0")/.."
LOG=RECOVERY_r03.log
run() {
  echo "=== $* — $(date -u +%FT%TZ) ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-3600}" "$@" 2>&1 | tail -40 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}

run python bench.py
run python scripts/bench_train.py --batch 8
run python scripts/bench_train.py --batch 16

if [ "${1:-}" != "quick" ]; then
  run python scripts/profile.py train --batch 16 --top 30
  run python scripts/profile.py detect --batch 128 --top 30
  # Warm TTA eval throughput on the committed fixture: tta_batch sweep
  # (variants/chip/launch) with the batched vote stage (vote_batch 32).
  for tb in 4 8 16 32; do
    run python scripts/eval.py --wider_root tests/fixtures/mini_wider \
      --gt_mats tests/fixtures/mini_wider/eval_tools/ground_truth \
      --tta_batch "$tb"
  done
fi
echo "recovery pass complete — $(date -u +%FT%TZ)" | tee -a "$LOG"
